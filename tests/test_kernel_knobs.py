"""Parity tests for the experimental kernel knobs (KVQ_EXP2, KVQ_MXU_SUM,
KVQ_BWD_PNFOLD): each knob-on run must match the knob-off default bitwise
up to f32 rounding, for both the eval block kernel's values and the train
block kernel's values + every gradient (interpret mode on CPU; Mosaic
compiles the same code on TPU).  The knobs claim exactness in their
comments — these tests hold them to it before any of them can become a
default."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import kvq_tpu.ops.window_attention as WA
from kvq_tpu.ops.window_attention import (
    WindowGeometry,
    fused_swin_block,
    train_swin_block,
)

pytestmark = pytest.mark.slow

DIMS, WINDOW, SHIFT = (4, 14, 14), (2, 7, 7), (1, 3, 3)
B, H, HD = 1, 2, 8
C = H * HD
HIDDEN = 2 * C
N = WINDOW[0] * WINDOW[1] * WINDOW[2]
NW = (DIMS[0] // WINDOW[0]) * (DIMS[1] // WINDOW[1]) * (DIMS[2] // WINDOW[2])
BW = B * NW


def _inputs(seed=7):
    rng = np.random.default_rng(seed)
    params = {
        "norm1_scale": jnp.asarray(
            1 + 0.1 * rng.normal(size=(C,)), jnp.float32),
        "norm1_bias": jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32),
        "qkv_w": jnp.asarray(
            rng.normal(size=(C, 3 * C), scale=0.3), jnp.float32),
        "qkv_b": jnp.asarray(0.1 * rng.normal(size=(3 * C,)), jnp.float32),
        "proj_w": jnp.asarray(
            rng.normal(size=(C, C), scale=0.3), jnp.float32),
        "proj_b": jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32),
        "norm2_scale": jnp.asarray(
            1 + 0.1 * rng.normal(size=(C,)), jnp.float32),
        "norm2_bias": jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32),
        "fc1_w": jnp.asarray(
            rng.normal(size=(C, HIDDEN), scale=0.3), jnp.float32),
        "fc1_b": jnp.asarray(0.1 * rng.normal(size=(HIDDEN,)), jnp.float32),
        "fc2_w": jnp.asarray(
            rng.normal(size=(HIDDEN, C), scale=0.3), jnp.float32),
        "fc2_b": jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(BW, N, C)), jnp.float32)
    rel = jnp.asarray(rng.normal(size=(H, N, N), scale=0.5), jnp.float32)
    frag = jnp.asarray(rng.normal(size=(H, N, N), scale=0.5), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(BW, N, C)), jnp.float32)
    geo = WindowGeometry(
        batch=B, dims=DIMS, window=WINDOW, shift=SHIFT,
        fragments=(1, 7, 7), num_heads=H, head_dim=HD, use_frag=True,
    )
    return x, params, rel, frag, cot, geo


def _patch_knob(monkeypatch, knob):
    if knob == "exp2":
        monkeypatch.setattr(WA, "SOFTMAX_EXP2", True)
        monkeypatch.setattr(WA, "_pexp", jnp.exp2)
        monkeypatch.setattr(WA, "_FOLD_CLAMP", 86.0)
    elif knob == "mxu_rowsum":
        monkeypatch.setattr(WA, "MXU_ROWSUM", True)
    elif knob == "pnfold":
        monkeypatch.setattr(WA, "BWD_PNFOLD", True)
    else:  # pragma: no cover
        raise ValueError(knob)


@pytest.mark.parametrize("knob", ["exp2", "mxu_rowsum"])
def test_eval_block_knob_matches_default(monkeypatch, knob):
    x, params, rel, frag, _, geo = _inputs()
    ref = np.asarray(fused_swin_block(x, params, rel, frag, geo,
                                      interpret=True))
    _patch_knob(monkeypatch, knob)
    out = np.asarray(fused_swin_block(x, params, rel, frag, geo,
                                      interpret=True))
    # exp2(s * log2 e) == exp(s) modulo one f32 rounding on the prescale;
    # the ones-column row sum reorders an f32 reduction — both are
    # rounding-level deltas, not approximations
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("knob", ["exp2", "pnfold"])
def test_train_block_knob_values_and_grads_match_default(monkeypatch, knob):
    x, params, rel, frag, cot, geo = _inputs()
    rng = np.random.default_rng(11)
    keep = 0.8
    dp = (rng.random(size=(2, B)) < keep).astype(np.float32) / keep
    dp1 = jnp.asarray(np.repeat(dp[0], NW)[:, None])
    dp2 = jnp.asarray(np.repeat(dp[1], NW)[:, None])

    def loss(x, params, rel, frag):
        out = train_swin_block(
            x, params, rel, frag, geo, dp1, dp2,
            scale=HD ** -0.5, interpret=True,
        )
        return jnp.sum(out * cot)

    vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))
    v_ref, g_ref = vg(x, params, rel, frag)
    _patch_knob(monkeypatch, knob)
    v_out, g_out = vg(x, params, rel, frag)

    np.testing.assert_allclose(float(v_out), float(v_ref), rtol=1e-6)
    for la, lb in zip(jax.tree_util.tree_leaves(g_out),
                      jax.tree_util.tree_leaves(g_ref)):
        scale_ref = max(1e-3, float(jnp.abs(lb).max()))
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb),
            atol=3e-5 * scale_ref, rtol=1e-4,
        )


def test_train_block_pnfold_clamp_saturation_grads(monkeypatch):
    """The fold-clamp zero-gradient guard must hold under BWD_PNFOLD too:
    its saturation test compares raw p against exp(_FOLD_CLAMP) directly
    (the non-fold branch compares normalized pn against clamp*rinv)."""
    x, params, rel, frag, cot, geo = _inputs(seed=13)
    # blow up the bias so some logits saturate the clamp
    rel_hot = rel.at[0, :3, :5].set(200.0)
    dp1 = dp2 = jnp.ones((BW, 1), jnp.float32)

    def loss(rel_b):
        out = train_swin_block(
            x, params, rel_b, frag, geo, dp1, dp2,
            scale=HD ** -0.5, interpret=True,
        )
        return jnp.sum(out * cot)

    g_ref = jax.grad(loss)(rel_hot)
    _patch_knob(monkeypatch, "pnfold")
    g_out = jax.grad(loss)(rel_hot)
    assert np.all(np.isfinite(np.asarray(g_out)))
    scale_ref = max(1e-3, float(jnp.abs(g_ref).max()))
    np.testing.assert_allclose(
        np.asarray(g_out), np.asarray(g_ref),
        atol=3e-5 * scale_ref, rtol=1e-4,
    )
