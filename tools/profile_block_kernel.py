"""Attribute time inside the fused Swin-block Pallas kernel.

Times fused_swin_block standalone at KSVQE stage geometries, then ablated
variants (frag bias off; shift off; both) to split MXU matmul work from
VPU softmax/bias/gate work.  Stage cost scales linearly with batch
(tools/profile_stage_isolation.py), so per-kernel efficiency is the eval
bottleneck — this locates where the ~13% MFU goes.

Usage: python tools/profile_block_kernel.py [B]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from tools.profile_ksvqe import timed_loop  # noqa: E802,E402


def main():
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/kvq_jax_cache"
    )
    import jax.numpy as jnp

    from kvq_tpu.ops import window_attention as WA
    from kvq_tpu.ops.window_attention import WindowGeometry, fused_swin_block

    if os.environ.get("KVQ_BIAS_CACHE") == "bf16":
        WA.BIAS_CACHE_DTYPE = jnp.bfloat16
        print("bias cache: bf16", flush=True)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    # (C, heads, (D,H,W)) for swin-tiny stages at T=96 eval shapes
    stages = [
        (96, 3, (48, 56, 56)),
        (192, 6, (48, 28, 28)),
        (384, 12, (48, 14, 14)),
        (768, 24, (48, 7, 7)),
    ]
    window = (8, 7, 7)
    N = window[0] * window[1] * window[2]

    # optional filters: argv[2] = comma-separated channel widths to time
    # (e.g. "96,192"), argv[3] = ablation-label substring (e.g. "frag+shift")
    only_c = None
    if len(sys.argv) > 2:
        only_c = {int(c) for c in sys.argv[2].split(",")}
    only_label = sys.argv[3] if len(sys.argv) > 3 else None

    for C, h, dims in stages:
        if only_c is not None and C not in only_c:
            continue
        D, H, W = dims
        wd = (min(window[0], D), min(window[1], H), min(window[2], W))
        Nw = wd[0] * wd[1] * wd[2]
        nW = (D // wd[0]) * (H // wd[1]) * (W // wd[2])
        BW = B * nW
        hidden = 4 * C
        params = {
            "norm1_scale": jnp.ones((C,), jnp.float32),
            "norm1_bias": jnp.zeros((C,), jnp.float32),
            "qkv_w": jnp.asarray(rng.normal(size=(C, 3 * C), scale=0.02), dt),
            "qkv_b": jnp.zeros((3 * C,), jnp.float32),
            "proj_w": jnp.asarray(rng.normal(size=(C, C), scale=0.02), dt),
            "proj_b": jnp.zeros((C,), jnp.float32),
            "norm2_scale": jnp.ones((C,), jnp.float32),
            "norm2_bias": jnp.zeros((C,), jnp.float32),
            "fc1_w": jnp.asarray(
                rng.normal(size=(C, hidden), scale=0.02), dt
            ),
            "fc1_b": jnp.zeros((hidden,), jnp.float32),
            "fc2_w": jnp.asarray(
                rng.normal(size=(hidden, C), scale=0.02), dt
            ),
            "fc2_b": jnp.zeros((C,), jnp.float32),
        }
        rel = jnp.asarray(rng.normal(size=(h, Nw, Nw)), jnp.float32)
        frag = jnp.asarray(rng.normal(size=(h, Nw, Nw)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(BW, Nw, C)), dt)

        flop = BW * (24 * C * C + 4 * Nw * C) * Nw  # per-block matmul FLOPs

        for label, use_frag, shift in [
            ("frag+shift", True, (4, 3, 3)),
            ("frag      ", True, (0, 0, 0)),
            ("shift     ", False, (4, 3, 3)),
            ("plain     ", False, (0, 0, 0)),
        ]:
            if only_label and only_label not in label.strip():
                continue
            geo = WindowGeometry(
                batch=B, dims=dims, window=wd,
                shift=shift if D > wd[0] or shift == (0, 0, 0) else (0, 3, 3),
                fragments=(1, 8, 8), num_heads=h, head_dim=C // h,
                use_frag=use_frag,
            )

            def fn(vs, xx, g=geo, uf=use_frag):
                return fused_swin_block(
                    xx, params, rel, frag if uf else None, g,
                    scale=(C // h) ** -0.5,
                )

            s = timed_loop(fn, {}, x)
            print(
                f"C={C:4d} {label}: {s * 1e3:7.2f} ms  "
                f"({flop / s / 1e12:5.1f} TF/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
