"""Coverage for the remaining VQA_Network model keys (swin variants,
conv_tiny) and head behaviors — reduced geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvq_tpu.models.vqa_network import VQANetwork

pytestmark = pytest.mark.slow  # model-assembly/e2e: minutes on small hosts


def _cfg(key, backbone=None, head=None):
    return {
        "model": {
            "type": key,
            "compute_dtype": "float32",
            "args": {key: {"backbone": backbone, "head": head or {"hidden_channels": 16}}},
        }
    }


def test_conv_tiny_key():
    model = VQANetwork(config=_cfg("conv_tiny"))
    # reads batch['asesthetic'] [sic] like the reference (conv_backbone.py:432)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 4, 32, 32, 3)), jnp.float32
    )
    v = model.init(jax.random.key(0), {"asesthetic": x}, train=False)
    out = model.apply(v, {"asesthetic": x}, train=False, reduce_scores=True)
    assert out.shape == (1, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_swin_tiny_grpb_m_key():
    model = VQANetwork(
        config=_cfg("swin_tiny_grpb_m", backbone={"checkpoint": False})
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 4, 16, 16, 3)), jnp.float32
    )
    v = model.init(jax.random.key(0), {"technical": x}, train=False)
    # FastVQA-M preset: (4,4,4) windows, no fragment bias tables
    names = [
        "/".join(str(p) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(v["params"])[0]
    ]
    assert not any("fragment_position_bias" in n for n in names)
    out = model.apply(v, {"technical": x}, train=False, reduce_scores=True)
    assert out.shape == (1, 1)


def test_multi_key_score_reduction():
    """Two model keys => reduce_scores sums their scores
    (reference models/model.py:105-109)."""
    cfg = {
        "model": {
            "type": "swin_tiny,conv_tiny",
            "compute_dtype": "float32",
            "args": {
                "swin_tiny": {
                    "backbone": {"checkpoint": False},
                    "head": {"hidden_channels": 8},
                },
                "conv_tiny": {"backbone": None, "head": {"hidden_channels": 8}},
            },
        }
    }
    model = VQANetwork(config=cfg)
    rng = np.random.default_rng(1)
    batch = {
        "technical": jnp.asarray(rng.normal(size=(2, 4, 28, 28, 3)), jnp.float32),
        "asesthetic": jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)), jnp.float32),
    }
    v = model.init(jax.random.key(0), batch, train=False)
    scores = model.apply(v, batch, train=False)
    assert len(scores) == 2
    reduced = model.apply(v, batch, train=False, reduce_scores=True)
    np.testing.assert_allclose(
        np.asarray(reduced), np.asarray(scores[0] + scores[1]), rtol=1e-6
    )


def test_var_and_iqa_and_maxvqa_heads():
    from kvq_tpu.nn.heads import IQAHead, MaxVQAHead, VARHead

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 2, 4, 4, 32)), jnp.float32
    )
    var = VARHead(out_channels=10, dtype=jnp.float32)
    v = var.init(jax.random.key(0), x)
    assert var.apply(v, x).shape == (2, 10)

    mx = MaxVQAHead(out_dims=3, hidden_channels_per_dim=8, dtype=jnp.float32)
    v = mx.init(jax.random.key(0), x)
    assert mx.apply(v, x).shape == (2, 3)

    iqa = IQAHead(hidden_channels=8, dtype=jnp.float32)
    v = iqa.init(jax.random.key(0), x)
    out = iqa.apply(v, x)
    # reference head.py:172: mean over the last three axes of the
    # projected tensor -> here (B,T,H,W,1) -> (B,T)
    assert out.shape == (2, 2)
