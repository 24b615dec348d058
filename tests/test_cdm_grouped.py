"""Grouped semantic cross-attention == per-frame gather.

kvq_tpu/nn/ksvqe.py batches the CDM semantic cross-attention per
keyframe group (adapter + k/v projections on the n_key distinct CLIP
token sets) instead of gathering broadcast copies per frame (reference
extend_fullcls_attn, KSVQE_model.py:1378-1386).  This locks the
equivalence: for contiguous equal groups the two forms are the same
math on the same weights.
"""

import jax
import jax.numpy as jnp
import numpy as np

from kvq_tpu.nn.cdm import AdapterMLP, CrossAttention


def test_grouped_semantic_cross_matches_gather():
    B, n_key, tg, hw, c, L, din = 2, 4, 3, 16, 8, 5, 12
    t = n_key * tg
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, t, hw, c)), jnp.float32)
    pat = jnp.asarray(rng.normal(size=(B, n_key, L, din)), jnp.float32)
    gid = tuple(g for g in range(n_key) for _ in range(tg))

    adapter = AdapterMLP(c)
    avars = adapter.init(jax.random.key(0), pat)
    cross = CrossAttention(num_heads=2)
    cvars = cross.init(
        jax.random.key(1),
        jnp.zeros((1, hw, c)),
        jnp.zeros((1, L, c)),
    )

    pt_key = adapter.apply(avars, pat)  # (B, n_key, L, c)

    # grouped form (the model's fast path)
    enh_g, _ = cross.apply(
        cvars,
        x.reshape(B * n_key, tg * hw, c),
        pt_key.reshape(B * n_key, L, c),
    )
    enh_g = enh_g.reshape(B * t, hw, c)

    # per-frame gather form (the fallback / reference semantics)
    pt = pt_key[:, jnp.asarray(gid)].reshape(B * t, L, c)
    enh_f, _ = cross.apply(cvars, x.reshape(B * t, hw, c), pt)

    np.testing.assert_allclose(
        np.asarray(enh_g), np.asarray(enh_f), rtol=1e-5, atol=1e-5
    )


def test_nonuniform_schedule_falls_back_to_gather():
    """T=12 halves to groups (0,1,1,2,3,3) — not equal runs — so the model
    must take the per-frame gather branch.  eval_shape traces the full
    forward (exercising the branch wiring) without running any compute."""
    from tests.test_ksvqe import TINY, tiny_batch
    from kvq_tpu.nn.ksvqe import KSVQE

    model = KSVQE(config=TINY, dtype=jnp.float32)
    batch = tiny_batch(B=1, T=12, rng_seed=7)
    shapes = jax.eval_shape(
        lambda b: model.init(
            {"params": jax.random.key(0), "qrs": jax.random.key(1)},
            b,
            train=False,
        ),
        batch,
    )
    assert "params" in shapes


def test_full_model_grouped_matches_forced_gather():
    """Grouped == gather through the FULL model (ADVICE r2): run the tiny
    KSVQE forward twice on the same params — once on the grouped fast path
    (uniform T=8 schedule), once with force_sem_gather — and compare
    numerically."""
    import dataclasses

    from tests.test_ksvqe import TINY, tiny_batch
    from kvq_tpu.nn.ksvqe import KSVQE

    batch = tiny_batch(B=2, T=8, rng_seed=11)
    model_g = KSVQE(config=TINY, dtype=jnp.float32)
    variables = model_g.init(
        {"params": jax.random.key(0), "qrs": jax.random.key(1)},
        batch,
        train=False,
    )
    feat_g, loss_g = model_g.apply(variables, batch, train=False)

    model_f = KSVQE(
        config=dataclasses.replace(TINY, force_sem_gather=True),
        dtype=jnp.float32,
    )
    feat_f, loss_f = model_f.apply(variables, batch, train=False)

    np.testing.assert_allclose(
        np.asarray(feat_g), np.asarray(feat_f), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        float(loss_g), float(loss_f), rtol=1e-6, atol=1e-6
    )


def test_full_model_nonuniform_schedule_runs_numerically():
    """The T=12 gather branch executes end to end (not just a shape trace)
    and produces finite outputs (ADVICE r2)."""
    from tests.test_ksvqe import TINY, tiny_batch
    from kvq_tpu.nn.ksvqe import KSVQE

    model = KSVQE(config=TINY, dtype=jnp.float32)
    batch = tiny_batch(B=1, T=12, rng_seed=7)
    variables = model.init(
        {"params": jax.random.key(0), "qrs": jax.random.key(1)},
        batch,
        train=False,
    )
    feat, dis_loss = model.apply(variables, batch, train=False)
    assert np.isfinite(np.asarray(feat)).all()
    assert np.isfinite(float(dis_loss))
