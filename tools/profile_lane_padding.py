#!/usr/bin/env python
"""Stage-0 lane-padding microbenchmark (VERDICT r4 #6).

Hypothesis: the (N, N) = (392, 392) score planes pad the 128-lane minor
dim to 512, wasting ~23% of every VPU pass.  This kernel isolates the
VPU phases the block kernel runs per score plane (bias-add + exp fused,
row-sum, normalize) at minor widths 384 (3 exact lane tiles), 392 (the
production width), and 512 (the padded width).  If padding is the
binding waste, 392 should cost the same as 512 and ~33% more than 384.

Run on TPU: python tools/profile_lane_padding.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")

    ROWS = 392
    STEPS = 8192  # grid steps, one plane-pass set per step (kernel-like)

    def make(width):
        def kernel(s_ref, b_ref, o_ref):
            i = pl.program_id(0)
            # the fold path's per-plane VPU work: fused add+exp (one
            # pass), row-sum, deferred-normalize contribution
            p = jnp.exp(s_ref[...] + b_ref[...] + i.astype(jnp.float32)
                        * 1e-6)
            r = jnp.sum(p, axis=-1, keepdims=True)
            o_ref[...] = (
                p[:, :1] * (1.0 / jnp.maximum(r, 1e-37))
            )[None]

        @jax.jit
        def run(s, b):
            return pl.pallas_call(
                kernel,
                grid=(STEPS,),
                out_shape=jax.ShapeDtypeStruct((STEPS, ROWS, 1),
                                               jnp.float32),
                in_specs=[
                    pl.BlockSpec((ROWS, width), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ROWS, width), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, ROWS, 1), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(s, b)

        return run

    import functools

    rng = np.random.default_rng(0)
    res = {}
    for width in (384, 392, 512):
        s = jnp.asarray(rng.normal(size=(ROWS, width)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(ROWS, width)), jnp.float32)
        run = make(width)

        @functools.partial(jax.jit, static_argnums=2)
        def many(s, b, n, run=run):
            acc = jnp.float32(0)
            ss = s
            for _ in range(n):
                out = run(ss, b)
                t = jnp.sum(out)
                acc += t
                ss = s + (t * jnp.float32(1e-9)).astype(s.dtype)
            return acc

        float(many(s, b, 1))
        float(many(s, b, 5))  # compile both variants

        def best(n):
            t = 1e9
            for _ in range(3):
                t0 = time.time()
                float(many(s, b, n))
                t = min(t, time.time() - t0)
            return t

        per_call = (best(5) - best(1)) / 4
        res[width] = per_call
        print(f"width {width}: {per_call * 1e6:9.1f} us/call "
              f"({per_call * 1e9 / (STEPS * ROWS * width):.4f} "
              f"ns/logical-elem)", flush=True)
    print(f"392 vs 384: {res[392] / res[384]:.3f}x   "
          f"392 vs 512: {res[392] / res[512]:.3f}x", flush=True)


if __name__ == "__main__":
    main()
