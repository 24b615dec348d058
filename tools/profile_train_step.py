"""KSVQE train-step throughput on one TPU chip, paper shapes.

Train workload (config/Kwai_KSVQE.yml): B=4 videos, clip_len=32,
fragment 288x288 + resize 112x112, full KSVQE forward + VQAHead, loss
= 0.3*dis_contra + plcc (rank loss off — SURVEY.md §5.1.2), AdamW
backward, EMA update.  Gradient checkpointing on (as the reference
defaults for training).

Same in-jit-loop timing methodology as bench.py.

Usage: python tools/profile_train_step.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import functools

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/kvq_jax_cache"
    )
    import jax.numpy as jnp
    import optax

    from kvq_tpu.models.vqa_network import VQANetwork
    from kvq_tpu.train.losses import plcc_loss
    from kvq_tpu.train.optim import build_optimizer

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    T = 32
    remat = os.environ.get("KVQ_REMAT", "1") == "1"
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    batch = {
        "fragment": jnp.asarray(rng.normal(size=(B, T, 288, 288, 3)), dt),
        "resize_video": jnp.asarray(rng.normal(size=(B, T, 112, 112, 3)), dt),
        "dis_label": jnp.asarray([i % 4 for i in range(B)], jnp.int32),
        "label": jnp.asarray(rng.normal(size=(B,)), jnp.float32),
    }
    config = {
        "model": {
            "type": "KSVQE",
            "compute_dtype": "bfloat16",
            "args": {
                "KSVQE": {
                    "backbone": {
                        "num_samples": 1,
                        "sample_type": "topkpertubation",
                        "CLIP_location": 8,
                        "cls_use": True,
                        "tuning_stage": 1,
                        "a1": 1,
                        "a2": 2,
                        "checkpoint": remat,  # train: remat on unless KVQ_REMAT=0
                    },
                    "head": {"in_channels": 768, "hidden_channels": 64},
                }
            },
        },
        "optimizer": {"lr": 3e-5, "backbone_lr_mult": 1.0, "wd": 0.05},
    }
    model = VQANetwork(config=config)
    rngs = {
        "params": jax.random.key(0),
        "qrs": jax.random.key(1),
        "dropout": jax.random.key(2),
    }
    t0 = time.time()
    variables = jax.jit(
        lambda: model.init(rngs, batch, train=True)
    )()
    jax.block_until_ready(variables)
    print(f"init: {time.time() - t0:.1f}s", flush=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    from kvq_tpu.train.optim import KSVQE_FROZEN_PATTERNS, ema_update

    # frozen_patterns matches the real Trainer (trainer.py:210-219): the
    # masked AdamW makes the frozen-tower gradients dead values so XLA
    # DCEs the CLIP/CONTRIQUE backward — omitting it here mismeasures the
    # step by the frozen backward + full-param moment traffic.
    tx = build_optimizer(
        params, lr=3e-5, weight_decay=0.05, warmup_iters=50, max_iters=1000,
        frozen_patterns=KSVQE_FROZEN_PATTERNS,
    )
    opt_state = tx.init(params)

    @functools.partial(jax.jit, static_argnums=3)
    def train_n(carry, b, key, n):
        params, ema_params, opt_state, acc = carry
        frag = b["fragment"]
        for i in range(n):
            key, k1, k2 = jax.random.split(key, 3)

            def loss_fn(p):
                bb = dict(b, fragment=frag)
                out = VQANetwork(config=config).apply(
                    {"params": p, **(
                        {"batch_stats": batch_stats} if batch_stats else {}
                    )},
                    bb,
                    train=True,
                    reduce_scores=True,
                    rngs={"qrs": k1, "dropout": k2},
                )
                scores, dis_loss = out
                loss = plcc_loss(scores, b["label"]) + 0.3 * dis_loss
                return loss.astype(jnp.float32)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema_params = ema_update(ema_params, params, 0.999)
            acc = acc + loss
            frag = b["fragment"] + (acc * 1e-9).astype(frag.dtype)
        return (params, ema_params, opt_state, acc)

    key = jax.random.key(3)
    carry = (params, jax.tree_util.tree_map(lambda t: t, params), opt_state, jnp.float32(0))
    t0 = time.time()
    c1 = train_n(carry, batch, key, 1)
    float(c1[3])  # force readback
    print(f"compile+first step: {time.time() - t0:.1f}s", flush=True)

    # A multi-step in-jit loop OOMs HBM (each unrolled step keeps its remat
    # activations live), so time single steps: perturb the input each call
    # (the remote runtime caches identical executions) and force a scalar
    # readback.  ~30 ms call overhead is small against a train step.
    times = []
    for i in range(4):
        b2 = dict(batch, fragment=batch["fragment"] + jnp.bfloat16(i * 1e-3))
        t0 = time.time()
        out = train_n(carry, b2, jax.random.key(10 + i), 1)
        float(out[3])
        times.append(time.time() - t0)
    step_s = min(times[1:])  # skip the first (donation/layout warmup)
    print(
        f"train step (B={B}, T={T}): {step_s * 1e3:.1f} ms "
        f"= {B / step_s:.2f} videos/s/chip (incl. ~30 ms call overhead)",
        flush=True,
    )


if __name__ == "__main__":
    main()
