#!/usr/bin/env python
"""Isolate the Swin trunk's TRAIN cost (fwd and fwd+bwd) at KSVQE shapes.

The per-block fused kernels measure ~28 ms fwd+bwd total
(tools/profile_train_block.py) while the step's "stages" marginal is
~83 ms (tools/profile_train_cuts.py) — this tool times the FULL
SwinTransformer3D (patch-merging glue, rolls, window partition/reverse,
stage-3 XLA path) standalone on the embedded (4, 16, 56, 56, 96) train
tokens to locate the difference.  KVQ_STAGES=n limits to the first n
stages (cumulative-cut the glue).

Usage: KVQ_PALLAS=1 python tools/profile_trunk_train.py [B]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")

    from kvq_tpu.nn import swin as S

    if os.environ.get("KVQ_GLUE_ONLY") == "1":
        # identity kernels: measures partition/reverse, rolls, DropPath,
        # PatchMerging, and stage-3 XLA glue without the block math
        import kvq_tpu.ops.window_attention as WA

        WA.train_swin_block = (
            lambda x, params, rel, frag, geo, dp1, dp2, **kw: x
        )
        print("glue-only: train_swin_block = identity", flush=True)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_stages = int(os.environ.get("KVQ_STAGES", "4"))
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    kw = dict(
        embed_dim=96,
        depths=(2, 2, 6, 2)[:n_stages],
        num_heads=(3, 6, 12, 24)[:n_stages],
        window_size=(8, 7, 7),
        frag_biases=(True, True, True, False)[:n_stages],
        use_checkpoint=False,
        drop_path_rate=0.1,
        use_pallas=os.environ.get("KVQ_PALLAS", "1") == "1",
    )
    model = S.SwinTrunk(config=S.SwinConfig(**kw), dtype=dt)
    # embedded tokens: KSVQE runs the same stages on (B, 16, 56, 56, 96)
    # with CDM interleaved (nn/ksvqe.py:322)
    x = jnp.asarray(rng.normal(size=(B, 16, 56, 56, 96)), dt)
    v = jax.jit(
        lambda xx: model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            xx, train=True,
        )
    )(x)

    def fwd_loss(p, xx, key):
        feats = model.apply(
            {"params": p}, xx, train=True, rngs={"dropout": key},
        )
        return jnp.sum(feats[-1].astype(jnp.float32) ** 2)

    grad_fn = jax.grad(fwd_loss)

    def timed(fn, tag):
        @functools.partial(jax.jit, static_argnums=3)
        def many(p, xx, key, n):
            acc = jnp.float32(0)
            cur = xx
            for i in range(n):
                s = fn(p, cur, jax.random.fold_in(key, i))
                acc += s
                cur = xx + (s * jnp.float32(1e-9)).astype(xx.dtype)
            return acc

        n1, n2 = 1, 4
        float(many(v["params"], x, jax.random.key(2), n1))
        float(many(v["params"], x, jax.random.key(2), n2))

        def best(n):
            b = 1e9
            for r in range(3):
                t0 = time.time()
                float(many(v["params"], x, jax.random.key(5 + r), n))
                b = min(b, time.time() - t0)
            return b

        t = (best(n2) - best(n1)) / (n2 - n1)
        print(f"{tag}: {t * 1e3:7.2f} ms", flush=True)
        return t

    timed(fwd_loss, f"trunk[{n_stages}st] fwd      ")
    timed(lambda p, xx, k: sum(
        jnp.sum(g.astype(jnp.float32) ** 2)
        for g in jax.tree_util.tree_leaves(grad_fn(p, xx, k))
    ), f"trunk[{n_stages}st] fwd+bwd  ")


if __name__ == "__main__":
    main()
