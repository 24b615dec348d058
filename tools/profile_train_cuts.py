"""Cumulative-cut timing of the KSVQE TRAIN step (fwd+bwd) on TPU.

Extends tools/profile_ksvqe_cuts.py to the training path (VERDICT r1
item 6): each prefix of the forward graph is differentiated w.r.t. all
params, so adjacent-cut differences give per-component fwd+bwd marginals.
Remat on (training default) unless KVQ_REMAT=0.

Usage: python tools/profile_train_cuts.py [B] [T]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import functools

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")

    from kvq_tpu.nn.ksvqe import KSVQE, ksvqe_config
    from kvq_tpu.nn.regionnet import keyframe_schedule
    from kvq_tpu.train.losses import distortion_contrastive_supervised

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    remat = os.environ.get("KVQ_REMAT", "1") == "1"
    s2d = os.environ.get("KVQ_S2D", "0") == "1"  # match the shipped config
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    frag = rng.normal(size=(B, T, 288, 288, 3)).astype(np.float32)
    if s2d:
        from kvq_tpu.data.fragments import s2d_pack

        frag = np.stack([s2d_pack(f) for f in frag])
    batch = {
        "fragment": jnp.asarray(frag, dt),
        "resize_video": jnp.asarray(rng.normal(size=(B, T, 112, 112, 3)), dt),
        "dis_label": jnp.asarray([i % 4 for i in range(B)], jnp.int32),
    }
    cfg = ksvqe_config(
        {"num_samples": 1, "sample_type": "topkpertubation",
         "CLIP_location": 8, "cls_use": True, "tuning_stage": 1,
         "a1": 1, "a2": 2, "checkpoint": remat,
         "use_pallas": os.environ.get("KVQ_PALLAS", "1") == "1",
         "contrique_fold_bn": os.environ.get("KVQ_FOLD", "1") == "1",
         "s2d_input": s2d}
    )
    print(f"s2d_input={s2d} remat={remat} "
          f"fold={cfg.contrique_fold_bn}", flush=True)
    model = KSVQE(config=cfg, dtype=dt)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0), "qrs": jax.random.key(1)},
            batch, train=False,
        )
    )()
    jax.block_until_ready(variables)

    def prefix(self, b, key, cut):
        revideo = b["resize_video"].astype(self.dtype)
        fragment = b["fragment"].astype(self.dtype)
        Bq = fragment.shape[0]
        Tq = fragment.shape[1] * (2 if self.config.s2d_input else 1)
        keyframes, group_id = keyframe_schedule(Tq)
        kf = revideo[:, jnp.asarray(keyframes)].reshape(
            Bq * 4, *revideo.shape[2:]
        )
        cls_attn, _ct, pat_tokens = self.CLIP_tool(kf)
        L = cls_attn.shape[-1]
        cls_attn = cls_attn.reshape(Bq, 4, L)
        if cut == "clip":
            return jnp.sum(cls_attn.astype(jnp.float32))
        if self.config.s2d_input:
            # packed path: QRS select + embed + dist unpack are one unit
            if cut == "qrs":
                return jnp.sum(self.selector.select(
                    cls_attn, group_id,
                    (fragment.shape[2] // 8, fragment.shape[3] // 8),
                    train=True, key=key,
                ).astype(jnp.float32))
            x, dist_in = self._select_and_embed_packed(
                fragment, cls_attn, group_id, train=True, key=key
            )
            if cut == "embed":
                return jnp.sum(x.astype(jnp.float32))
        else:
            x_sel = self.selector(
                fragment, cls_attn, group_id, train=True, key=key
            )
            if cut == "qrs":
                return jnp.sum(x_sel.astype(jnp.float32))
            x = self.patch_embed(x_sel)
            if cut == "embed":
                return jnp.sum(x.astype(jnp.float32))
            dist_in = jax.lax.stop_gradient(x_sel)[:, ::2]
        dist_tok = self.distortion_tool(dist_in)
        dist_tok = 0.2 * self.dist_adapter(dist_tok) + 0.8 * dist_tok
        loss = distortion_contrastive_supervised(dist_tok, b["dis_label"])
        if cut == "dist":
            return (
                jnp.sum(x.astype(jnp.float32)) + loss.astype(jnp.float32)
            )
        if cut == "stages":
            for stage in self.layers:
                x = stage(x, train=True)
            return (
                jnp.sum(x.astype(jnp.float32)) + loss.astype(jnp.float32)
            )
        raise ValueError(cut)

    from kvq_tpu.train.optim import KSVQE_FROZEN_PATTERNS, trainable_mask

    # Differentiate w.r.t. the TRAINABLE subtree only — the real train
    # step's masked AdamW makes frozen-tower gradients dead values, so XLA
    # DCEs that backward (optim.py:build_optimizer).  Reading every
    # trainable leaf's grad prevents the opposite failure: an earlier
    # version consumed only grads-leaf[0], which let XLA DCE most of the
    # backward and undercount every marginal.
    def split_params(params):
        mask = trainable_mask(params, KSVQE_FROZEN_PATTERNS)
        train_p = jax.tree_util.tree_map(
            lambda m, p: p if m else None, mask, params,
            is_leaf=lambda x: x is None,
        )
        frozen_p = jax.tree_util.tree_map(
            lambda m, p: None if m else p, mask, params,
            is_leaf=lambda x: x is None,
        )
        return train_p, frozen_p

    def merge_params(train_p, frozen_p):
        return jax.tree_util.tree_map(
            lambda a, b: a if a is not None else b, train_p, frozen_p,
            is_leaf=lambda x: x is None,
        )

    def timed_grad(make_loss, n_rep=3):
        @jax.jit
        def g(vs, b, key):
            train_p, frozen_p = split_params(vs["params"])

            def loss_fn(tp):
                return make_loss({
                    "params": merge_params(tp, frozen_p),
                    **{k: v for k, v in vs.items() if k != "params"},
                }, b, key)

            l, grads = jax.value_and_grad(loss_fn)(train_p)
            gsum = sum(
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree_util.tree_leaves(grads)
                if x is not None
            )
            return l + gsum * 1e-12

        # perturb input each call; force scalar readback
        float(g(variables, batch, jax.random.key(5)))
        times = []
        for i in range(n_rep + 1):
            b2 = dict(
                batch,
                fragment=batch["fragment"] + jnp.bfloat16(1e-3 * (i + 1)),
            )
            t0 = time.time()
            float(g(variables, b2, jax.random.key(6 + i)))
            times.append(time.time() - t0)
        return min(times[1:])

    results = {}
    for cut in ("clip", "qrs", "embed", "dist", "stages"):
        def make_loss(vs, b, key, c=cut):
            return model.apply(
                vs, b, key, c, method=prefix,
                rngs={"qrs": key, "dropout": jax.random.fold_in(key, 7)},
            )

        s = timed_grad(make_loss)
        results[cut] = s
        print(f"grad through {cut:6s}: {s * 1e3:7.1f} ms", flush=True)

    def full_loss(vs, b, key):
        feat, dis = model.apply(
            vs, b, train=True,
            rngs={"qrs": key, "dropout": jax.random.fold_in(key, 7)},
        )
        return jnp.sum(feat.astype(jnp.float32)) + dis.astype(jnp.float32)

    s = timed_grad(full_loss)
    results["full"] = s
    print(f"grad full backbone  : {s * 1e3:7.1f} ms", flush=True)
    print()
    print(f"CLIP fwd+bwd        : {results['clip'] * 1e3:7.1f} ms")
    print(f"QRS marginal        : {(results['qrs'] - results['clip']) * 1e3:7.1f} ms")
    print(f"embed marginal      : {(results['embed'] - results['qrs']) * 1e3:7.1f} ms")
    print(f"dist marginal       : {(results['dist'] - results['embed']) * 1e3:7.1f} ms")
    print(f"stages marginal     : {(results['stages'] - results['dist']) * 1e3:7.1f} ms")
    print(f"CDM marginal        : {(results['full'] - results['stages']) * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
