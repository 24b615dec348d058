"""KSVQE assembly tests at reduced geometry (paper shapes are exercised on
TPU by bench.py; CPU tests use a shrunken but structurally identical model:
same tool chain, modulation schedule, losses)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvq_tpu.nn.ksvqe import KSVQE, KSVQEConfig
from kvq_tpu.nn.regionnet import keyframe_schedule

pytestmark = pytest.mark.slow  # model-assembly/e2e: minutes on small hosts

TINY = KSVQEConfig(
    num_samples=4,
    tuning_stage=1,
    a1=1.0,
    a2=2.0,
    anchor_size=8,
    region_k=9,
    embed_dim=16,
    depths=(1, 1),
    num_heads=(2, 2),
    window_size=(2, 7, 7),
    use_checkpoint=False,
    contrique_layers=(1, 1, 1, 1),
    clip_layers=2,
    clip_width=64,
    clip_heads=4,
)


def tiny_batch(B=2, T=8, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return {
        # fragment mosaic: 5x5 anchors of 8px = 40x40
        "fragment": jnp.asarray(
            rng.normal(size=(B, T, 40, 40, 3)), jnp.float32
        ),
        # resize view: 32x32 -> CLIP grid 2x2 (patch 16)
        "resize_video": jnp.asarray(
            rng.normal(size=(B, T, 32, 32, 3)), jnp.float32
        ),
        "dis_label": jnp.asarray([i % 2 for i in range(B)], jnp.int32),
        "label": jnp.asarray(rng.normal(size=(B,)), jnp.float32),
    }


@pytest.fixture(scope="module")
def ksvqe_tiny():
    model = KSVQE(config=TINY, dtype=jnp.float32)
    batch = tiny_batch()
    variables = model.init(
        {"params": jax.random.key(0), "qrs": jax.random.key(1)},
        batch,
        train=False,
    )
    return model, variables


def test_keyframe_schedule_matches_reference_rule():
    # reference obtain_keyframes: frames 0, t/4-1, t/2-1, 3t/4-1;
    # group increments at each threshold (KSVQE_model.py:1358-1376)
    kf, group = keyframe_schedule(32)
    assert kf == (0, 7, 15, 23)
    assert group[:8] == (0, 0, 0, 0, 0, 0, 0, 1)
    assert group[15] == 2 and group[16] == 2
    assert group[23] == 3 and group[31] == 3
    kf96, group96 = keyframe_schedule(96)
    assert kf96 == (0, 23, 47, 71)
    assert len(group96) == 96 and group96[-1] == 3


def test_eval_forward_shapes(ksvqe_tiny):
    model, variables = ksvqe_tiny
    batch = tiny_batch(B=2, T=8, rng_seed=3)
    feat, dis_loss = model.apply(variables, batch, train=False)
    # region 3x8=24 -> patch embed (2,4,4): T 8->4, 24->6; one merge: 6->3
    assert feat.shape == (2, 4, 3, 3, 32)
    assert np.isfinite(np.asarray(feat)).all()
    assert np.isfinite(float(dis_loss))


def test_eval_deterministic(ksvqe_tiny):
    model, variables = ksvqe_tiny
    batch = tiny_batch(B=2, T=8, rng_seed=4)
    a, _ = model.apply(variables, batch, train=False)
    b, _ = model.apply(variables, batch, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_forward_uses_qrs_rng(ksvqe_tiny):
    model, variables = ksvqe_tiny
    batch = tiny_batch(B=2, T=8, rng_seed=5)
    out1, _ = model.apply(
        variables, batch, train=True,
        rngs={"qrs": jax.random.key(1), "dropout": jax.random.key(2)},
    )
    out2, _ = model.apply(
        variables, batch, train=True,
        rngs={"qrs": jax.random.key(7), "dropout": jax.random.key(2)},
    )
    # different QRS noise -> different soft region selection -> different feats
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_gradients_flow_to_trainables(ksvqe_tiny):
    model, variables = ksvqe_tiny
    batch = tiny_batch(B=2, T=8, rng_seed=6)

    def loss_fn(params):
        feat, dis = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            batch,
            train=True,
            rngs={"qrs": jax.random.key(0), "dropout": jax.random.key(1)},
        )
        return (feat**2).mean() + 0.3 * dis

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]

    def gnorm(substr):
        tot = 0.0
        for path, g in flat:
            if substr in "/".join(str(p) for p in path):
                tot += float(np.abs(np.asarray(g)).sum())
        return tot

    assert gnorm("layers_0") > 0          # swin trunk
    assert gnorm("a1") >= 0 and gnorm("a2") >= 0
    assert gnorm("dist_adapter") > 0      # through contrastive loss
    assert gnorm("semantic_adapter_0") > 0
    # CLIP receives gradient through cls_attn -> QRS (frozen via optimizer
    # mask, not via stop_gradient — matching requires_grad semantics where
    # adapters inside CLIP must still train)
    assert gnorm("CLIP_tool") >= 0


def test_a_params_initialized_from_config(ksvqe_tiny):
    _, variables = ksvqe_tiny
    np.testing.assert_allclose(np.asarray(variables["params"]["a1"]), 1.0)
    np.testing.assert_allclose(np.asarray(variables["params"]["a2"]), 2.0)


def test_distortion_tool_has_batch_stats(ksvqe_tiny):
    _, variables = ksvqe_tiny
    assert "distortion_tool" in variables["batch_stats"]
