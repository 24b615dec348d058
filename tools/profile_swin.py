"""Deep-dive: Swin trunk and QRS/CDM timing on TPU.

Measures (a) full Swin trunk with Pallas vs XLA window attention,
(b) each stage in isolation, (c) the QRS region selector at eval shapes.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from tools.profile_ksvqe import timed_loop  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/kvq_jax_cache"
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    from kvq_tpu.nn.swin import (
        BasicLayer,
        SwinTransformer3D,
        swin_config,
    )

    xsel = {"technical": jnp.asarray(
        rng.normal(size=(B, T, 224, 224, 3)), dt)}

    for pal in (True, False):
        scfg = swin_config(
            "swin_tiny", {"use_pallas": pal, "checkpoint": False}
        )
        swin = SwinTransformer3D(config=scfg, dtype=dt)
        svs = jax.jit(
            lambda m=swin: m.init(jax.random.key(0), xsel, train=False)
        )()
        jax.block_until_ready(svs)
        s = timed_loop(
            lambda vs, x, m=swin: m.apply(vs, x, train=False), svs, xsel
        )
        print(f"Swin trunk pallas={pal}: {s * 1e3:8.1f} ms")

    # per-stage timing (token-space inputs, stage dims of swin-tiny)
    stage_dims = [(96, (48, 56, 56)), (192, (48, 28, 28)),
                  (384, (48, 14, 14)), (768, (48, 7, 7))]
    depths = (2, 2, 6, 2)
    heads = (3, 6, 12, 24)
    for pal in (True, False):
        total = 0.0
        for i, (C, (D, H, W)) in enumerate(stage_dims):
            layer = BasicLayer(
                depth=depths[i],
                num_heads=heads[i],
                window_size=(8, 7, 7),
                drop_paths=(0.0,) * depths[i],
                downsample=False,
                frag_bias=False,
                use_checkpoint=False,
                use_pallas=pal,
                dtype=dt,
            )
            x = jnp.asarray(rng.normal(size=(B, D, H, W, C)), dt)
            vs = jax.jit(
                lambda l=layer, xx=x: l.init(
                    jax.random.key(0), xx, train=False
                )
            )()
            jax.block_until_ready(vs)
            s = timed_loop(
                lambda v, xx, l=layer: l.apply(v, xx, train=False), vs, x
            )
            total += s
            print(f"  stage{i} pallas={pal} {C}x{D}x{H}x{W}: "
                  f"{s * 1e3:7.1f} ms")
        print(f"  sum stages pallas={pal}: {total * 1e3:7.1f} ms")

    # QRS at eval shapes
    from kvq_tpu.nn.regionnet import RegionSelector, keyframe_schedule

    qrs = RegionSelector(k=49, anchor_size=32, num_samples=1,
                         sample_type="topkpertubation")
    _, group_id = keyframe_schedule(T, 4)
    frag = jnp.asarray(rng.normal(size=(B, T, 288, 288, 3)), dt)
    cls_attn = jnp.asarray(rng.normal(size=(B, 4, 49)), jnp.float32)

    def qrs_fn(vs, args):
        f, ca = args
        return qrs(f, ca, group_id, train=False)

    s = timed_loop(qrs_fn, {}, (frag, cls_attn))
    print(f"QRS select (eval): {s * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
