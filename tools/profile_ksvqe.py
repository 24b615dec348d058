"""Component-wise KSVQE timing breakdown on the real TPU chip.

Times each subcomponent (CLIP tool, CONTRIQUE, QRS, Swin trunk stages,
CDM) with the same in-jit-loop + readback-difference methodology as
bench.py, at the bench workload shapes (B videos x 96 frames).

Usage: python tools/profile_ksvqe.py [B]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed_loop(fn, variables, args, n1=1, n2=5, reps=3):
    """Device seconds per call via two-loop-length differencing.

    ``variables`` MUST be an explicit argument (not a closure) — closed-over
    device arrays are serialized into the program as constants, which blows
    the remote-compile request size (HTTP 413 through the axon tunnel).
    """
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=2)
    def loop(vs, a, n):
        acc = jnp.float32(0)
        x = a
        for _ in range(n):
            out = fn(vs, x)
            s = jnp.sum(
                jax.tree_util.tree_reduce(
                    lambda c, l: c + jnp.sum(l.astype(jnp.float32)),
                    out,
                    jnp.float32(0),
                )
            )
            acc = acc + s
            x = jax.tree_util.tree_map(
                lambda t: t + (s * jnp.float32(1e-9)).astype(t.dtype), x
            )
        return acc

    float(loop(variables, args, n1))
    float(loop(variables, args, n2))

    def t(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(loop(variables, args, n))
            best = min(best, time.time() - t0)
        return best

    return max((t(n2) - t(n1)) / (n2 - n1), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/kvq_jax_cache"
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    T = 96
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    from kvq_tpu.nn.ksvqe import KSVQE, ksvqe_config

    cfg = ksvqe_config(
        {
            "num_samples": 1,
            "sample_type": "topkpertubation",
            "CLIP_location": 8,
            "cls_use": True,
            "tuning_stage": 1,
            "a1": 1,
            "a2": 2,
            "checkpoint": False,
            "use_pallas": True,
        }
    )
    model = KSVQE(config=cfg, dtype=dt)
    batch = {
        "fragment": jnp.asarray(rng.normal(size=(B, T, 288, 288, 3)), dt),
        "resize_video": jnp.asarray(rng.normal(size=(B, T, 112, 112, 3)), dt),
        "dis_label": jnp.zeros((B,), jnp.int32),
    }
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0), "qrs": jax.random.key(1)},
            batch,
            train=False,
        )
    )()
    jax.block_until_ready(variables)

    # ---- full model
    full_s = timed_loop(
        lambda vs, b: model.apply(vs, b, train=False)[0], variables, batch
    )
    print(f"full KSVQE fwd: {full_s * 1e3:8.1f} ms  "
          f"({B / full_s:6.2f} videos/s)")

    # ---- CLIP tool on 4 keyframes
    from kvq_tpu.nn.clip_vit import CLIPVisionTower

    clip = CLIPVisionTower(
        clip_location=cfg.clip_location,
        cls_use=cfg.cls_use,
        layers=cfg.clip_layers,
        width=cfg.clip_width,
        heads=cfg.clip_heads,
        dtype=dt,
    )
    kf = jnp.asarray(rng.normal(size=(B * 4, 112, 112, 3)), dt)
    cvs = jax.jit(lambda: clip.init(jax.random.key(0), kf))()
    jax.block_until_ready(cvs)
    clip_s = timed_loop(lambda vs, x: clip.apply(vs, x), cvs, kf)
    print(f"CLIP tool (4 keyframes): {clip_s * 1e3:8.1f} ms "
          f"({100 * clip_s / full_s:5.1f}%)")

    # ---- CONTRIQUE on 48 frames x 7x7 patches of 32
    from kvq_tpu.nn.contrique import CONTRIQUE

    ctq = CONTRIQUE(layers=cfg.contrique_layers, dtype=dt)
    sel = jnp.asarray(rng.normal(size=(B, T // 2, 224, 224, 3)), dt)
    tvs = jax.jit(lambda: ctq.init(jax.random.key(0), sel))()
    jax.block_until_ready(tvs)
    ctq_s = timed_loop(lambda vs, x: ctq.apply(vs, x), tvs, sel)
    print(f"CONTRIQUE (48f x 49 patches): {ctq_s * 1e3:8.1f} ms "
          f"({100 * ctq_s / full_s:5.1f}%)")

    # ---- Swin trunk alone (post-QRS shapes): patch_embed + 4 stages
    from kvq_tpu.nn.swin import SwinTransformer3D, swin_config

    scfg = swin_config("swin_tiny", {"use_pallas": True, "checkpoint": False})
    swin = SwinTransformer3D(config=scfg, dtype=dt)
    xsel = {"technical": jnp.asarray(
        rng.normal(size=(B, T, 224, 224, 3)), dt)}
    svs = jax.jit(lambda: swin.init(jax.random.key(0), xsel, train=False))()
    jax.block_until_ready(svs)
    swin_s = timed_loop(lambda vs, x: swin.apply(vs, x, train=False), svs, xsel)
    print(f"Swin trunk (224^2 x {T}f): {swin_s * 1e3:8.1f} ms "
          f"({100 * swin_s / full_s:5.1f}%)")

    resid = full_s - clip_s - ctq_s - swin_s
    print(f"residual (QRS + CDM + glue): {resid * 1e3:8.1f} ms "
          f"({100 * resid / full_s:5.1f}%)")


if __name__ == "__main__":
    main()
