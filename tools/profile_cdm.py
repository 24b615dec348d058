"""Locate the superlinear B=1 -> B=4 cost inside the CDM path.

tools/profile_ksvqe_cuts.py showed the CDM marginal scaling ~6.2x from
B=1 to B=4 at eval (T=96) while every other cut scales ~4x (linear).
This times each CDM sub-module standalone — semantic/distortion adapter
MLPs, the two cross-attentions (reference crossattention1), the
temporal self-attention, and both FiLMs — per stage, at a sweep of
batch sizes, so the superlinear op can be pinned and fixed.

Usage: python tools/profile_cdm.py [B ...]   (default: 1 4)
KVQ_CDM_PALLAS=1 builds the attention modules with use_pallas=True (the
channel-layout flash kernel eval path) for an on/off comparison.
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, ".")

from tools.profile_ksvqe import timed_loop  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")

    from kvq_tpu.nn.cdm import (
        AdapterMLP, CrossAttention, DistFiLM, SemanticFiLM,
        TemporalAttention,
    )

    if os.environ.get("KVQ_CDM_PALLAS") == "1":
        print("cdm attention modules: use_pallas=True", flush=True)
        CrossAttention = functools.partial(CrossAttention, use_pallas=True)  # noqa: N806
        TemporalAttention = functools.partial(  # noqa: N806
            TemporalAttention, use_pallas=True
        )

    batches = [int(a) for a in sys.argv[1:]] or [1, 4]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    t = 48          # T=96 eval, temporally halved by patch embed
    L = 197         # CLIP ViT-B/16 tokens at 224px (14*14 + cls)
    G = 49          # CONTRIQUE 7x7 patch grid tokens
    # (stage_dim, heads, side) for tuning_stage=1 CDM stages
    stages = [(192, 6, 28), (384, 12, 14), (768, 24, 7)]

    def r(*shape):
        return jnp.asarray(rng.normal(size=shape, scale=0.02), dt)

    for c, h, side in stages:
        hw = side * side
        print(f"--- stage c={c} h={h} {side}x{side}", flush=True)
        mods = {
            "sem_adapter": (AdapterMLP(c, dtype=dt),
                            lambda B: (r(B * t, L, 768),)),
            "sem_cross": (CrossAttention(h, dtype=dt),
                          lambda B: (r(B * t, hw, c), r(B * t, L, c))),
            "sem_film": (SemanticFiLM(dtype=dt),
                         lambda B: (r(B * t, side, side, c),
                                    r(B * t, side, side, c))),
            "dist_adapter": (AdapterMLP(c, dtype=dt),
                             lambda B: (r(B, t, G, 128),)),
            "dist_cross": (CrossAttention(h, dtype=dt),
                           lambda B: (r(B * t, hw, c), r(B * t, G, c))),
            "dist_self": (TemporalAttention(h, dtype=dt),
                          lambda B: (r(B * hw, t, c),)),
            "dist_film": (DistFiLM(dtype=dt),
                          lambda B: (r(B, t, side, side, c),
                                     r(B, t * hw, c))),
        }
        for name, (mod, make) in mods.items():
            times = []
            for B in batches:
                args = make(B)
                vs = jax.jit(mod.init)(jax.random.PRNGKey(0), *args)

                def fn(v, a, m=mod):
                    out = m.apply(v, *a)
                    return out if isinstance(out, jnp.ndarray) else out[0]

                s = timed_loop(fn, vs, args)
                times.append(s)
            ratio = times[-1] / times[0] if times[0] > 0 else float("nan")
            cols = "  ".join(
                f"B={B}: {s * 1e3:6.2f} ms" for B, s in zip(batches, times)
            )
            print(f"  {name:13s} {cols}  ratio {ratio:4.1f}x", flush=True)


if __name__ == "__main__":
    main()
