#!/usr/bin/env python
"""A/B: CONTRIQUE frozen-BN fold vs module path on TPU (VERDICT r4 #2).

Same in-jit differencing as bench.py (two loop lengths cancel the
per-call round-trip).  Standalone tower at the production shapes:
T=48 (the [:, ::2] temporal half of the 96-frame eval clip), 224x224
-> 49 patches/frame, bf16.
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

    def step_time(model, vs, x, n1=1, n2=5):
        import functools

        @functools.partial(jax.jit, static_argnums=2)
        def many(vs, x, n):
            acc = jnp.float32(0)
            xx = x
            for _ in range(n):
                y = model.apply(vs, xx)
                s = jnp.sum(y.astype(jnp.float32))
                acc += s
                xx = x + (s * jnp.float32(1e-9)).astype(x.dtype)
            return acc

        float(many(vs, x, n1))
        float(many(vs, x, n2))

        def best(n, reps=3):
            b = 1e9
            for _ in range(reps):
                t0 = time.time()
                float(many(vs, x, n))
                b = min(b, time.time() - t0)
            return b

        return (best(n2) - best(n1)) / (n2 - n1)

    for B in (1, 4, 16):
        T = 48
        x = jnp.asarray(rng.normal(size=(B, T, 224, 224, 3)), dt)
        m_mod = CONTRIQUE(anchor_size=32, dtype=dt, fold_bn=False)
        m_fold = CONTRIQUE(anchor_size=32, dtype=dt, fold_bn=True)
        vs = jax.jit(lambda xx: m_mod.init(jax.random.key(0), xx))(x)
        t_mod = step_time(m_mod, vs, x)
        t_fold = step_time(m_fold, vs, x)
        print(
            f"B={B}: module {t_mod * 1e3:8.2f} ms  fold {t_fold * 1e3:8.2f} ms"
            f"  ({(t_mod - t_fold) / t_mod * 100:+.1f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
