"""Candidate fixes for the CDM temporal-attention batch-scaling regression.

tools/profile_cdm.py pins the superlinear B=1->4 CDM cost on the
attention modules — worst is TemporalAttention at stage-0 eval shape
(B*hw, t, c) = (3136, 48, 192): 0.96 -> 7.93 ms (8.2x for 4x work).
XLA materializes the (X, h, 48, 48) fp32 score tensor to HBM with lane
padding 48->128, and its batched-matmul handling degrades further at
large batch counts.

Variants timed here (bare attention core, qkv/proj excluded):
  xla      — current einsum composition (fp32 scores, softmax, bf16 AV)
  bf16     — scores kept bf16 end to end (precision-relaxed strawman)
  fold     — heads folded into the batch dim ((X*h, n, hd) batched matmul)
  pallas   — no-bias flash kernel (scores never leave VMEM)

Usage: python tools/profile_cdm_variants.py [B ...]   (default: 1 4)
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")

from tools.profile_ksvqe import timed_loop  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")

    batches = [int(a) for a in sys.argv[1:]] or [1, 4]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    t, hw, c, h = 48, 784, 192, 6
    hd = c // h
    scale = hd**-0.5

    def attn_xla(q, k, v):
        s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v)

    def attn_bf16(q, k, v):
        s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v)

    def attn_fold(q, k, v):
        X = q.shape[0]
        qf = q.reshape(X * h, t, hd)
        kf = k.reshape(X * h, t, hd)
        vf = v.reshape(X * h, t, hd)
        s = jax.lax.dot_general(
            qf * scale, kf, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        p = jax.nn.softmax(s, axis=-1).astype(vf.dtype)
        o = jax.lax.dot_general(p, vf, (((2,), (1,)), ((0,), (0,))))
        return o.reshape(X, h, t, hd)

    def attn_pallas(p):
        def fn(q, k, v):
            from kvq_tpu.ops.window_attention import flash_attention_nobias

            return flash_attention_nobias(q, k, v, scale=scale,
                                          pack_override=p)

        return fn

    variants = {"xla": attn_xla, "bf16": attn_bf16, "fold": attn_fold}
    try:
        from kvq_tpu.ops.window_attention import flash_attention_nobias  # noqa
        for p in (1, 2, 4, 8):
            variants[f"pallas{p}"] = attn_pallas(p)
    except ImportError:
        pass
    only = os.environ.get("KVQ_VARIANTS")
    if only:
        names = only.split(",")
        variants = {k: v for k, v in variants.items() if k in names}

    for name, fn in variants.items():
        times = []
        for B in batches:
            X = B * hw
            q = jnp.asarray(rng.normal(size=(X, h, t, hd), scale=0.02), dt)
            k = jnp.asarray(rng.normal(size=(X, h, t, hd), scale=0.02), dt)
            v = jnp.asarray(rng.normal(size=(X, h, t, hd), scale=0.02), dt)

            def run(_, a, f=fn):
                return f(*a)

            try:
                s = timed_loop(run, jnp.zeros(()), (q, k, v))
            except Exception as e:  # noqa: BLE001
                print(f"  {name:8s} B={B}: FAILED {type(e).__name__}: {e}",
                      flush=True)
                times = None
                break
            times.append(s)
        if times is None:
            continue
        ratio = times[-1] / times[0] if times[0] > 0 else float("nan")
        cols = "  ".join(
            f"B={B}: {s * 1e3:6.2f} ms" for B, s in zip(batches, times)
        )
        print(f"  {name:8s} {cols}  ratio {ratio:4.1f}x", flush=True)


if __name__ == "__main__":
    main()
