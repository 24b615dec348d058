import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvq_tpu.models.vqa_network import VQANetwork

pytestmark = pytest.mark.slow  # model-assembly/e2e: minutes on small hosts

CFG = {
    "model": {
        "type": "simpleVQA",
        "args": {
            "simpleVQA": {
                "backbone": None,
                "head": {"in_channels": 9472, "hidden_channels": 128},
            }
        },
        "compute_dtype": "float32",
    }
}


@pytest.fixture(scope="module")
def model_and_params():
    model = VQANetwork(config=CFG)
    batch = {
        "simpleVQA": jnp.zeros((1, 2, 64, 64, 3)),
        "feat": jnp.zeros((1, 2, 2304)),
    }
    variables = model.init(jax.random.key(0), batch, train=False)
    return model, variables


def test_forward_shapes(model_and_params):
    model, variables = model_and_params
    batch = {
        "simpleVQA": jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 2, 64, 64, 3)),
            dtype=jnp.float32,
        ),
        "feat": jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 2, 2304)), dtype=jnp.float32
        ),
    }
    scores = model.apply(variables, batch, train=False)
    assert isinstance(scores, list) and len(scores) == 1
    assert scores[0].shape == (2, 1)
    reduced = model.apply(variables, batch, train=False, reduce_scores=True)
    np.testing.assert_allclose(np.asarray(reduced), np.asarray(scores[0]))


def test_feature_dims(model_and_params):
    """Backbone feature layout: 2*(512+1024+2048) resnet + 2304 slowfast."""
    model, variables = model_and_params
    from kvq_tpu.nn.resnet import FeatureResNet

    bb = FeatureResNet(dtype=jnp.float32)
    batch = {
        "simpleVQA": jnp.zeros((1, 2, 64, 64, 3)),
        "feat": jnp.zeros((1, 2, 2304)),
    }
    v = bb.init(jax.random.key(0), batch, train=False)
    feat = bb.apply(v, batch, train=False)
    assert feat.shape == (1, 2, 2 * (512 + 1024 + 2048) + 2304)  # 9472


def test_train_mode_updates_batch_stats(model_and_params):
    model, variables = model_and_params
    batch = {
        "simpleVQA": jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 2, 64, 64, 3)) * 5,
            dtype=jnp.float32,
        ),
        "feat": jnp.zeros((2, 2, 2304)),
    }
    out, mutated = model.apply(
        variables,
        batch,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)},
    )
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_jit_forward(model_and_params):
    model, variables = model_and_params

    @jax.jit
    def fwd(v, batch):
        return model.apply(v, batch, train=False, reduce_scores=True)

    batch = {
        "simpleVQA": jnp.zeros((1, 2, 64, 64, 3)),
        "feat": jnp.zeros((1, 2, 2304)),
    }
    out = fwd(variables, batch)
    assert out.shape == (1, 1)
    assert np.isfinite(np.asarray(out)).all()
