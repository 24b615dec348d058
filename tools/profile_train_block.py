#!/usr/bin/env python
"""Per-stage TRAIN block cost: fused train_swin_block fwd and fwd+bwd at
KSVQE train geometries (B=4, T=32 -> token depth 16, 224px region ->
56x56 stage-0 tokens).  Locates where the train step's ~83 ms "stages"
share (tools/profile_train_cuts.py) concentrates; depths (2,2,6,2)
weight the per-block numbers.

Usage: python tools/profile_train_block.py [B]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")

    from kvq_tpu.nn.swin import get_window_size
    from kvq_tpu.ops.window_attention import (
        WindowGeometry,
        train_swin_block,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    stages = [  # (C, h, dims, depth, frag)
        (96, 3, (16, 56, 56), 2, True),
        (192, 6, (16, 28, 28), 2, True),
        (384, 12, (16, 14, 14), 6, True),
        (768, 24, (16, 7, 7), 2, False),
    ]
    total_fwd = total_both = 0.0
    for C, h, dims, depth, frag in stages:
        window, shift = get_window_size(dims, (8, 7, 7), (4, 3, 3))
        nW = (dims[0] // window[0]) * (dims[1] // window[1]) * (
            dims[2] // window[2]
        )
        N = window[0] * window[1] * window[2]
        BW = B * nW
        hidden = 4 * C
        geo = WindowGeometry(
            batch=B, dims=dims, window=window, shift=shift,
            fragments=(1, 7, 7), num_heads=h, head_dim=C // h, use_frag=frag,
        )
        params = {
            "norm1_scale": jnp.ones((C,), jnp.float32),
            "norm1_bias": jnp.zeros((C,), jnp.float32),
            "qkv_w": jnp.asarray(
                rng.normal(size=(C, 3 * C), scale=0.05), dt),
            "qkv_b": jnp.zeros((3 * C,), jnp.float32),
            "proj_w": jnp.asarray(rng.normal(size=(C, C), scale=0.05), dt),
            "proj_b": jnp.zeros((C,), jnp.float32),
            "norm2_scale": jnp.ones((C,), jnp.float32),
            "norm2_bias": jnp.zeros((C,), jnp.float32),
            "fc1_w": jnp.asarray(
                rng.normal(size=(C, hidden), scale=0.05), dt),
            "fc1_b": jnp.zeros((hidden,), jnp.float32),
            "fc2_w": jnp.asarray(
                rng.normal(size=(hidden, C), scale=0.05), dt),
            "fc2_b": jnp.zeros((C,), jnp.float32),
        }
        x = jnp.asarray(rng.normal(size=(BW, N, C)), dt)
        rel = jnp.asarray(rng.normal(size=(h, N, N), scale=0.5), jnp.float32)
        fragb = (
            jnp.asarray(rng.normal(size=(h, N, N), scale=0.5), jnp.float32)
            if frag else None
        )
        dp = jnp.ones((BW, 1), jnp.float32)
        cot = jnp.asarray(rng.normal(size=(BW, N, C)), dt)

        def fwd_loss(x, params, rel, fragb):
            out = train_swin_block(
                x, params, rel, fragb, geo, dp, dp, scale=(C // h) ** -0.5
            )
            return jnp.sum((out * cot).astype(jnp.float32))

        grad_fn = jax.grad(fwd_loss, argnums=(0, 1, 2))

        @functools.partial(jax.jit, static_argnums=4)
        def many_fwd(x, params, rel, fragb, n):
            acc = jnp.float32(0)
            xx = x
            for _ in range(n):
                s = fwd_loss(xx, params, rel, fragb)
                acc += s
                xx = x + (s * jnp.float32(1e-9)).astype(x.dtype)
            return acc

        @functools.partial(jax.jit, static_argnums=4)
        def many_both(x, params, rel, fragb, n):
            acc = jnp.float32(0)
            xx = x
            for _ in range(n):
                g = grad_fn(xx, params, rel, fragb)
                s = jnp.sum(g[0].astype(jnp.float32) ** 2)
                acc += s
                xx = x + (s * jnp.float32(1e-12)).astype(x.dtype)
            return acc

        def diff_time(fn):
            n1, n2 = 1, 4
            float(fn(x, params, rel, fragb, n1))
            float(fn(x, params, rel, fragb, n2))
            def best(n):
                b = 1e9
                for _ in range(3):
                    t0 = time.time()
                    float(fn(x, params, rel, fragb, n))
                    b = min(b, time.time() - t0)
                return b
            return (best(n2) - best(n1)) / (n2 - n1)

        t_f = diff_time(many_fwd)
        t_b = diff_time(many_both)
        total_fwd += t_f * depth
        total_both += t_b * depth
        print(
            f"C={C:4d} h={h:2d} nW={nW:3d} depth={depth}: "
            f"fwd {t_f * 1e3:6.2f} ms/blk  fwd+bwd {t_b * 1e3:6.2f} ms/blk "
            f"(bwd/fwd {(t_b - t_f) / max(t_f, 1e-9):4.1f}x)  "
            f"stage fwd+bwd {t_b * depth * 1e3:6.1f} ms",
            flush=True,
        )
    print(f"trunk totals: fwd {total_fwd * 1e3:.1f} ms  "
          f"fwd+bwd {total_both * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
