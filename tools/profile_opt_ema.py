#!/usr/bin/env python
"""Optimizer + EMA share of the train step (VERDICT r4 #1 scoping).

Scan-differenced full train steps (bench.py methodology) under four
tails: adamw+ema (shipped), adamw only, adamw + trainable-masked ema,
and no-update (grads still computed and consumed).  Adjacent differences
give the true cost of the optimizer pass and of EMA-ing the frozen 115M
params that never change.

Usage: python tools/profile_opt_ema.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")

    import bench
    from kvq_tpu.models.vqa_network import VQANetwork
    from kvq_tpu.train.losses import plcc_loss
    from kvq_tpu.train.optim import (
        KSVQE_FROZEN_PATTERNS,
        build_optimizer,
        ema_update,
        trainable_mask,
    )

    B, T = 4, 32
    model = bench.make_model(checkpoint=False)
    config = model.config
    batch = bench.make_batch(B, T, jnp, seed=2)
    batch = dict(
        batch,
        dis_label=jnp.asarray([i % 4 for i in range(B)], jnp.int32),
        label=jnp.asarray(
            np.random.default_rng(1).normal(size=(B,)), jnp.float32
        ),
    )
    variables, init_s = bench.init_variables(model, batch)
    print(f"init {init_s:.0f}s", flush=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = build_optimizer(
        params, lr=3e-5, weight_decay=0.05, warmup_iters=50, max_iters=1000,
        frozen_patterns=KSVQE_FROZEN_PATTERNS,
    )
    opt_state = tx.init(params)
    mask = trainable_mask(params, KSVQE_FROZEN_PATTERNS)

    def loss_fn(p, b, k1, k2):
        out = VQANetwork(config=config).apply(
            {"params": p, **({"batch_stats": batch_stats}
                             if batch_stats else {})},
            b, train=True, reduce_scores=True,
            rngs={"qrs": k1, "dropout": k2},
        )
        scores, dis_loss = out
        return (plcc_loss(scores, b["label"]) + 0.3 * dis_loss).astype(
            jnp.float32
        )

    def make_step(tail):
        def one_step(params, ema, opt_state, b, key):
            k1, k2 = jax.random.split(key)
            if tail == "fwdonly":
                loss = loss_fn(params, b, k1, k2)
                return params, ema, opt_state, loss
            loss, grads = jax.value_and_grad(loss_fn)(params, b, k1, k2)
            if tail == "none":
                # consume grads without an update (keeps bwd alive)
                gnorm = sum(
                    jnp.sum(g.astype(jnp.float32) ** 2)
                    for g in jax.tree_util.tree_leaves(grads)
                )
                return params, ema, opt_state, loss + 0.0 * gnorm
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if tail == "adamw+ema":
                ema = ema_update(ema, params, 0.999)
            elif tail == "adamw+mema":
                ema = jax.tree_util.tree_map(
                    lambda m, e, p: e * 0.999 + p * 0.001 if m else e,
                    mask, ema, params,
                )
            return params, ema, opt_state, loss

        @functools.partial(jax.jit, static_argnums=4)
        def train_n(params, ema, opt_state, key, n, b):
            def body(carry, i):
                p, e, o = carry
                p, e, o, loss = one_step(
                    p, e, o, b, jax.random.fold_in(key, i)
                )
                return (p, e, o), loss

            (params, ema, opt_state), losses = jax.lax.scan(
                body, (params, ema, opt_state), jnp.arange(n)
            )
            return jnp.sum(losses)

        return train_n

    ema = jax.tree_util.tree_map(lambda t: t, params)
    for tail in ("adamw+ema", "adamw", "adamw+mema", "none", "fwdonly"):
        fn = make_step(tail)
        n1, n2 = 1, 4
        float(fn(params, ema, opt_state, jax.random.key(3), n1, batch))
        float(fn(params, ema, opt_state, jax.random.key(3), n2, batch))

        def best(n):
            b = 1e9
            for r in range(3):
                t0 = time.time()
                float(fn(params, ema, opt_state,
                         jax.random.key(10 + r), n, batch))
                b = min(b, time.time() - t0)
            return b

        step = (best(n2) - best(n1)) / (n2 - n1)
        print(f"{tail:11s}: {step * 1e3:7.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
