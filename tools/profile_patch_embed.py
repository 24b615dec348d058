"""Micro-benchmark: space-to-depth patch-embed formulations on TPU.

The (2,4,4) patch embed of a (4,96,224,224,3) clip is bandwidth-bound on
the relayout that collects each patch's (ti,hi,wi,c) elements.  Variants:

  a) current: 8-D transpose with C=3 minor, then one (K=96) matmul
  b) free-regroup: W*C=672 -> (wo,12) is a *free* reshape (W-major,
     C-minor ordering is exactly wo-major,(wi,c)-minor), then a
     multi-contracting dot_general over (ti,hi,k=12)
  c) 8 strided slices x[:, ti::2, hi::4] (contiguous 12-wide rows) each
     through a K=12 matmul, tree-summed
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

    B, T, H, W, C = 4, 96, 224, 224, 3
    pt, ph, pw, F = 2, 4, 4, 96
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C)), dt)
    w = jnp.asarray(rng.normal(size=(pt, ph, pw, C, F)) * 0.02, dt)
    b = jnp.zeros((F,), dt)

    @jax.jit
    def v_a(x, w, b):
        y = x.reshape(B, T // pt, pt, H // ph, ph, W // pw, pw, C)
        y = y.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        y = y.reshape(B, T // pt, H // ph, W // pw, pt * ph * pw * C)
        return y @ w.reshape(-1, F) + b

    @jax.jit
    def v_b(x, w, b):
        # free regroup: (B,T,H,W*C) -> (B,to,ti,ho,hi,wo,12)
        y = x.reshape(B, T // pt, pt, H // ph, ph, W // pw, pw * C)
        w2 = w.reshape(pt, ph, pw * C, F)
        out = jax.lax.dot_general(
            y, w2,
            dimension_numbers=(((2, 4, 6), (0, 1, 2)), ((), ())),
        )
        return out + b

    @jax.jit
    def v_c(x, w, b):
        y = x.reshape(B, T, H, (W // pw) * pw * C)
        y = y.reshape(B, T, H, W // pw, pw * C)
        w2 = w.reshape(pt, ph, pw * C, F)
        out = None
        for ti in range(pt):
            for hi in range(ph):
                sl = y[:, ti::pt, hi::ph]  # (B, to, ho, wo, 12)
                d = sl @ w2[ti, hi]
                out = d if out is None else out + d
        return out + b

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def pe_kernel(x_ref, w_ref, b_ref, out_ref):
        # x_ref (1,1,pt,H,56,12); w_ref (pt,ph,12,F); out (1,1,56,56,F)
        acc = None
        for ti in range(pt):
            for hi in range(ph):
                sl = x_ref[0, 0, ti, hi::ph]  # (56, 56, 12)
                d = jax.lax.dot_general(
                    sl, w_ref[ti, hi],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = d if acc is None else acc + d
        out_ref[0, 0] = (acc + b_ref[0].astype(jnp.float32)).astype(
            out_ref.dtype
        )

    @jax.jit
    def v_d(x, w, b):
        x5 = x.reshape(B, T // pt, pt, H, W // pw, pw * C)
        w2 = w.reshape(pt, ph, pw * C, F)
        grid = (B * (T // pt),)
        return pl.pallas_call(
            pe_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, pt, H, W // pw, pw * C),
                             lambda i: (i // (T // pt), i % (T // pt), 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(w2.shape, lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, H // ph, W // pw, F),
                lambda i: (i // (T // pt), i % (T // pt), 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (B, T // pt, H // ph, W // pw, F), x.dtype
            ),
        )(x5.reshape(B, T // pt, pt, H, W // pw, pw * C),
          w2, b.reshape(1, F))

    @jax.jit
    def v_e(x, w, b):
        # free-regroup + ONE transpose moving pw*C=12-element chunks
        # (vs 3-element in variant a); patch-vector order (ti,hi,wi,c)
        # preserved so the same kernel reshape applies
        y = x.reshape(B, T // pt, pt, H // ph, ph, W // pw, pw * C)
        y = y.transpose(0, 1, 3, 5, 2, 4, 6)
        y = y.reshape(B, T // pt, H // ph, W // pw, pt * ph * pw * C)
        return y @ w.reshape(-1, F) + b

    ra = v_a(x, w, b)
    rb = v_b(x, w, b)
    rc = v_c(x, w, b)
    re = v_e(x, w, b)
    print("max|a-e|", float(jnp.max(jnp.abs(ra.astype(jnp.float32) - re.astype(jnp.float32)))))
    print("max|a-b|", float(jnp.max(jnp.abs(ra.astype(jnp.float32) - rb.astype(jnp.float32)))))
    print("max|a-c|", float(jnp.max(jnp.abs(ra.astype(jnp.float32) - rc.astype(jnp.float32)))))
    try:
        rd = v_d(x, w, b)
        print("max|a-d|", float(jnp.max(jnp.abs(ra.astype(jnp.float32) - rd.astype(jnp.float32)))))
        pallas_ok = True
    except Exception as e:
        print("pallas variant failed:", str(e)[:300])
        pallas_ok = False

    wb = {"w": w, "b": b}
    for name, fn in [("a transpose+matmul", v_a), ("b dot_general regroup", v_b),
                     ("c 8-slice K=12", v_c), ("e regroup transpose", v_e)] + (
                         [("d pallas fused", v_d)] if pallas_ok else []):
        s = timed_loop(lambda vs, xx, f=fn: f(xx, vs["w"], vs["b"]), wb, x)
        print(f"{name:24s}: {s*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
