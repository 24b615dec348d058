"""Localize the in-graph vs isolated Swin-stage gap at KSVQE eval shapes.

profile_ksvqe_cuts reports ~15.7 ms/video for the 4 Swin stages in-graph
(B=1, T=96), yet profile_swin's isolated BasicLayers sum to ~3 ms/video.
This times the isolated stages while toggling the suspects one at a time:
frag bias (KSVQE: on for stages 0-2), batch size, and the full
SwinTransformer3D trunk (adds patch-merging downsamples + final norm).

Usage: python tools/profile_stage_isolation.py [B] [T]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from tools.profile_ksvqe import timed_loop  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    D = T // 2
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    from kvq_tpu.nn.swin import BasicLayer, SwinTransformer3D, swin_config

    stage_dims = [(96, (D, 56, 56)), (192, (D, 28, 28)),
                  (384, (D, 14, 14)), (768, (D, 7, 7))]
    depths = (2, 2, 6, 2)
    heads = (3, 6, 12, 24)
    frag_flags = (True, True, True, False)  # KSVQE / fragments config

    for frag in (False, True):
        total = 0.0
        for i, (C, (Dd, H, W)) in enumerate(stage_dims):
            layer = BasicLayer(
                depth=depths[i], num_heads=heads[i], window_size=(8, 7, 7),
                drop_paths=(0.0,) * depths[i], downsample=False,
                frag_bias=frag and frag_flags[i], use_checkpoint=False,
                use_pallas=True, dtype=dt,
            )
            x = jnp.asarray(rng.normal(size=(B, Dd, H, W, C)), dt)
            vs = jax.jit(lambda l=layer, xx=x: l.init(
                jax.random.key(0), xx, train=False))()
            jax.block_until_ready(vs)
            s = timed_loop(
                lambda v, xx, l=layer: l.apply(v, xx, train=False), vs, x)
            total += s
            print(f"  stage{i} frag={frag and frag_flags[i]!s:5s} "
                  f"{C}x{Dd}x{H}x{W}: {s * 1e3:7.2f} ms", flush=True)
        print(f"  sum stages frag={frag}: {total * 1e3:7.2f} ms", flush=True)

    # full trunk (downsamples + final norm), KSVQE frag config
    scfg = swin_config(
        "swin_tiny_grpb", {"use_pallas": True, "checkpoint": False})
    swin = SwinTransformer3D(config=scfg, dtype=dt)
    xin = {"technical": jnp.asarray(
        rng.normal(size=(B, T, 224, 224, 3)), dt)}
    vs = jax.jit(lambda: swin.init(jax.random.key(0), xin, train=False))()
    jax.block_until_ready(vs)
    s = timed_loop(
        lambda v, xx: swin.apply(v, xx, train=False), vs, xin)
    print(f"full trunk (frag cfg, incl patch_embed+downsample+norm): "
          f"{s * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
