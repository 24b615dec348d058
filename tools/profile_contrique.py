#!/usr/bin/env python
"""CONTRIQUE distortion-tool cut profile at B=1 vs B=4 (TPU).

The B=4 eval regression's largest component is the dist-path marginal
(tools/profile_ksvqe_cuts.py: 2.4 ms/video at B=1 -> 4.05 ms/video at
B=4).  Cuts: anchor patchify relayout | ResNet trunk | normalize+projector.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")

    from kvq_tpu.nn.contrique import CONTRIQUE

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def timed(fn, x, variables=None, n=4):
        # variables passed explicitly — closure-captured device arrays
        # serialize into the program as constants and blow the remote
        # compile request (HTTP 413 through the axon tunnel)
        @jax.jit
        def many(vs, x):
            acc = jnp.float32(0)
            xx = x
            for _ in range(n):
                y = fn(vs, xx)
                s = jnp.sum(y.astype(jnp.float32))
                acc += s
                xx = x + (s * jnp.float32(1e-9)).astype(x.dtype)
            return acc

        float(many(variables, x))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(many(variables, x))
            best = min(best, time.time() - t0)
        return best / n

    for B in (1, 4):
        T = 48  # T/2 of the 96-frame eval clip
        x = jnp.asarray(rng.normal(size=(B, T, 224, 224, 3)), dt)
        model = CONTRIQUE(anchor_size=32, dtype=dt)
        vs = jax.jit(lambda: model.init(jax.random.key(0), x))()
        jax.block_until_ready(vs)

        def patchify(xx, a=32):
            Bq, Tq, H, W, C = xx.shape
            gh, gw = H // a, W // a
            return (
                xx.reshape(Bq, Tq, gh, a, gw, a, C)
                .transpose(0, 1, 2, 4, 3, 5, 6)
                .reshape(Bq * Tq * gh * gw, a, a, C)
            )

        t_patch = timed(lambda _vs, xx: patchify(xx), x)
        t_full = timed(lambda vv, xx: model.apply(vv, xx), x, vs)
        print(
            f"B={B}: patchify {t_patch*1e3:7.2f} ms | full {t_full*1e3:7.2f} ms"
            f" | trunk+proj {(t_full - t_patch)*1e3:7.2f} ms",
            flush=True,
        )
        if B > 1:
            # fix hypothesis for the superlinear B=1->4 dist cut: chunk the
            # batch back to per-video programs (lax.map), reproducing the
            # B=1-optimal XLA layout at the cost of serialization
            def chunked(vv, xx):
                return jax.lax.map(lambda v: model.apply(vv, v[None]), xx)

            t_chunk = timed(chunked, x, vs)
            print(f"B={B}: lax.map per-video {t_chunk*1e3:7.2f} ms",
                  flush=True)

    # trunk-only patch-count scaling (layout isolation: no patchify, no
    # projector) — superlinearity here implicates XLA's conv scheduling
    from kvq_tpu.nn.resnet import ResNetTrunk

    trunk = ResNetTrunk(layers=(3, 4, 6, 3), dtype=dt)
    p0 = jnp.asarray(rng.normal(size=(2352, 32, 32, 3)), dt)
    tvs = jax.jit(lambda: trunk.init(jax.random.key(1), p0, train=False))()
    jax.block_until_ready(tvs)
    for n_patch in (2352, 4704, 9408):
        p = jnp.asarray(rng.normal(size=(n_patch, 32, 32, 3)), dt)
        t_tr = timed(
            lambda vv, pp: trunk.apply(vv, pp, train=False)[-1], p, tvs
        )
        print(
            f"trunk N={n_patch}: {t_tr*1e3:7.2f} ms"
            f" ({t_tr/n_patch*1e6:5.2f} us/patch)",
            flush=True,
        )


if __name__ == "__main__":
    main()
