"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvq_tpu.parallel import make_mesh
from kvq_tpu.parallel import sharding as shd
from kvq_tpu.parallel import steps as psteps
from kvq_tpu.train import optim
from kvq_tpu.train.trainer import TrainState, array_batch
from kvq_tpu.models.vqa_network import VQANetwork

pytestmark = pytest.mark.slow  # model-assembly/e2e: minutes on small hosts


CFG = {
    "name": "par",
    "ema": True,
    "model": {
        "type": "simpleVQA",
        "compute_dtype": "float32",
        "args": {
            "simpleVQA": {
                "backbone": {"layers": [1, 1, 1, 1]},
                "head": {"hidden_channels": 8},
            }
        },
    },
    "optimizer": {"lr": 1e-3, "wd": 0.01},
}


def make_batch(B=8, T=2, hw=32):
    rng = np.random.default_rng(0)
    return {
        "simpleVQA": jnp.asarray(rng.normal(size=(B, T, hw, hw, 3)), jnp.float32),
        "feat": jnp.asarray(rng.normal(size=(B, T, 2304)), jnp.float32),
        "label": jnp.asarray(rng.normal(size=(B,)), jnp.float32),
    }


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    # bn_axis_name='data' => SyncBatchNorm semantics inside shard_map (the
    # DDP path).  The jit/fsdp path needs a model WITHOUT the named axis.
    model = VQANetwork(config=CFG, bn_axis_name="data")
    batch = make_batch()
    variables = model.init(jax.random.key(0), batch, train=False)
    tx = optim.build_optimizer(
        variables["params"], lr=1e-3, weight_decay=0.01,
        warmup_iters=0, max_iters=100,
    )
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        ema_params=jax.tree_util.tree_map(jnp.copy, variables["params"]),
        step=jnp.asarray(0, jnp.int32),
    )
    return model, tx, state, batch


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "fsdp": 1}
    mesh2 = make_mesh(data=4, fsdp=2)
    assert mesh2.shape == {"data": 4, "fsdp": 2}


def test_ddp_step_runs_and_syncs(setup):
    model, tx, state, batch = setup
    # per-shard batch must be >= 2 for the correlation losses (same
    # constraint as the reference's per-GPU batch of 4): 8 samples / 4 shards
    mesh = make_mesh(data=4, fsdp=2)
    step = psteps.make_ddp_train_step(model, tx, CFG, mesh)
    sb = shd.shard_batch(mesh, dict(batch))
    new_state, aux = step(state, sb, jax.random.key(0))
    assert int(new_state.step) == 1
    assert np.isfinite(float(aux["total_loss"]))
    # params updated identically across replicas (replicated spec)
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_fsdp_sharded_step(setup):
    _, tx, state, batch = setup
    model = VQANetwork(config=CFG)  # no named BN axis under plain jit
    mesh = make_mesh(data=4, fsdp=2)
    step, sh_state = psteps.make_sharded_train_step(
        model, tx, CFG, mesh, state
    )
    sb = shd.shard_batch(mesh, dict(batch))
    new_state, aux = step(sh_state, sb, jax.random.key(0))
    assert np.isfinite(float(aux["total_loss"]))
    # at least one large param is actually sharded over fsdp
    shardings = shd.param_shardings(mesh, state.params)
    specs = [s.spec for s in jax.tree_util.tree_leaves(shardings)]
    assert any("fsdp" in str(s) for s in specs)


def test_eval_step_sharded(setup):
    _, tx, state, batch = setup
    model = VQANetwork(config=CFG)
    mesh = make_mesh(data=8)
    ev = psteps.make_eval_step(model, CFG, mesh)
    tagged = dict(batch)
    tagged["sample_index"] = np.arange(8, dtype=np.int32)
    sb = shd.shard_batch(mesh, tagged)
    out, gidx, glab = ev(state.params, state.batch_stats, array_batch(sb))
    assert out.shape == (8, 1)
    assert np.isfinite(np.asarray(out)).all()
    # the tagged passthrough is replicated (the all_gather analog)
    np.testing.assert_array_equal(np.asarray(gidx), np.arange(8))
    np.testing.assert_allclose(
        np.asarray(glab).reshape(-1), np.asarray(tagged["label"]).reshape(-1)
    )


def test_ddp_loss_is_mean_of_per_shard_losses(setup):
    """DDP-parity check: the reported loss equals the mean over shards of
    the per-shard plcc losses (reference DDP semantics — per-rank loss,
    gradient all-reduce)."""
    import jax.numpy as jnp

    from kvq_tpu.train.losses import plcc_loss

    model, tx, state, batch = setup
    mesh = make_mesh(data=4, fsdp=2)
    step = psteps.make_ddp_train_step(model, tx, CFG, mesh)
    sb = shd.shard_batch(mesh, dict(batch))
    _, aux = step(state, sb, jax.random.key(0))

    # Manual check.  SyncBN makes train-mode BN statistics *global* (pmean
    # over shards == full-batch stats for equal shards), so run the full
    # batch through a non-axis model to reproduce the normalization, then
    # take per-shard plcc.  SimpleVQA has no dropout, so rngs don't matter.
    plain = VQANetwork(config=CFG)
    scores = plain.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(0)},
    )[0][0]
    losses = [
        float(
            plcc_loss(
                scores[s * 2 : (s + 1) * 2],
                batch["label"][s * 2 : (s + 1) * 2].reshape(-1, 1),
            )
        )
        for s in range(4)
    ]
    assert float(aux["total_loss"]) == pytest.approx(
        np.mean(losses), rel=1e-4
    )


def test_shard_prefetch_matches_sequential_steps(setup):
    """Depth-2 prefetched mesh train input (data/pipeline.shard_prefetch)
    produces step-for-step identical states to the sequential
    shard_batch-per-step form (VERDICT r2 item 6)."""
    from kvq_tpu.data.pipeline import shard_prefetch

    model, tx, state, _ = setup
    mesh = make_mesh(data=4, fsdp=2)
    step = psteps.make_ddp_train_step(model, tx, CFG, mesh)

    rng = np.random.default_rng(7)

    def batches():
        for i in range(4):
            yield {
                "simpleVQA": rng.normal(size=(8, 2, 32, 32, 3)).astype(
                    np.float32
                ),
                "feat": rng.normal(size=(8, 2, 2304)).astype(np.float32),
                "label": rng.normal(size=(8,)).astype(np.float32),
            }

    seq_batches = list(batches())

    # sequential form (the pre-r3 loop)
    s_seq = state
    for i, b in enumerate(seq_batches):
        sb = shd.shard_batch(mesh, dict(b))
        s_seq, _ = step(s_seq, sb, jax.random.key(100 + i))

    # prefetched form (order must be preserved)
    s_pre = state
    for i, sb in enumerate(shard_prefetch(mesh, iter(seq_batches))):
        s_pre, _ = step(s_pre, sb, jax.random.key(100 + i))

    assert int(s_seq.step) == int(s_pre.step) == 4
    for a, b in zip(
        jax.tree_util.tree_leaves(s_seq.params),
        jax.tree_util.tree_leaves(s_pre.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
