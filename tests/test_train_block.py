"""Fused whole-block TRAIN kernel: forward + every gradient vs the XLA
composition (interpret mode on CPU; Mosaic compiles the same code on TPU).

Golden = a plain-JAX differentiable block using the same window/bias
helpers the model path uses (fragment gate + additive shift mask), exact
erf GELU, and DropPath multipliers — autodiff through it gives reference
gradients for x, all weights, and both bias tables.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvq_tpu.nn import swin as S
from kvq_tpu.ops.window_attention import WindowGeometry, train_swin_block

pytestmark = pytest.mark.slow


def _golden_block(x, params, rel, frag, gate, mask, dp1, dp2, h, scale,
                  clamp=None):
    """Differentiable XLA reference of one Swin block at (BW, N, C).

    clamp: replicate the kernels' fold-path softmax exactly —
    ``exp(min(s, clamp)) / max(sum, 1e-37)`` — so autodiff through THIS
    function is the ground truth for the saturated-logit gradient
    semantics (d exp(min(s, C))/ds = 0 where s >= C)."""
    BW, N, C = x.shape
    hd = C // h
    nW = gate.shape[0] if gate is not None else (
        mask.shape[0] if mask is not None else BW
    )

    def ln(t, s, b):
        mu = t.mean(-1, keepdims=True)
        var = jnp.maximum(0.0, (t * t).mean(-1, keepdims=True) - mu * mu)
        return (t - mu) * jax.lax.rsqrt(var + 1e-6) * s + b

    y = ln(x, params["norm1_scale"], params["norm1_bias"])
    qkv = y @ params["qkv_w"] + params["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):  # (BW, N, C) -> (BW, h, N, hd)
        return t.reshape(BW, N, h, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q) * scale, heads(k), heads(v)
    s = jnp.einsum("whnd,whmd->whnm", q, k)
    if frag is not None:
        bias = rel[None] * gate[:, None] + frag[None] * (1 - gate[:, None])
        bias = jnp.tile(bias, (BW // nW, 1, 1, 1))
    else:
        bias = jnp.broadcast_to(rel[None], s.shape)
    s = s + bias
    if mask is not None:
        s = s + jnp.tile(mask[:, None], (BW // nW, 1, 1, 1))
    if clamp is not None:
        pe = jnp.exp(jnp.minimum(s, clamp))
        p = pe / jnp.maximum(jnp.sum(pe, axis=-1, keepdims=True), 1e-37)
    else:
        p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("whnm,whmd->whnd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(BW, N, C)
    att = o @ params["proj_w"] + params["proj_b"]
    x1 = x + dp1[:, :, None] * att
    y2 = ln(x1, params["norm2_scale"], params["norm2_bias"])
    mlp = jax.nn.gelu(
        y2 @ params["fc1_w"] + params["fc1_b"], approximate=False
    ) @ params["fc2_w"] + params["fc2_b"]
    return x1 + dp2[:, :, None] * mlp


@pytest.mark.parametrize(
    "shift,use_frag,droppath",
    [
        ((1, 3, 3), True, True),
        ((1, 3, 3), False, False),
        ((0, 0, 0), True, False),
        ((0, 0, 0), False, True),
    ],
)
def test_train_block_grads_match_xla(shift, use_frag, droppath):
    dims, window = (4, 14, 14), (2, 7, 7)
    B, h, hd = 1, 2, 8
    C = h * hd
    hidden = 2 * C
    N = window[0] * window[1] * window[2]
    nW = (dims[0] // window[0]) * (dims[1] // window[1]) * (
        dims[2] // window[2]
    )
    BW = B * nW
    rng = np.random.default_rng(3)

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
            rng.normal(size=(C, hidden), scale=0.3), jnp.float32),
        "fc1_b": jnp.asarray(0.1 * rng.normal(size=(hidden,)), jnp.float32),
        "fc2_w": jnp.asarray(
            rng.normal(size=(hidden, C), scale=0.3), jnp.float32),
        "fc2_b": jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(BW, N, C)), jnp.float32)
    rel = jnp.asarray(rng.normal(size=(h, N, N), scale=0.5), jnp.float32)
    frag = (
        jnp.asarray(rng.normal(size=(h, N, N), scale=0.5), jnp.float32)
        if use_frag else None
    )
    if droppath:
        keep = 0.8
        dp = (rng.random(size=(2, B)) < keep).astype(np.float32) / keep
        dp1 = jnp.asarray(np.repeat(dp[0], nW)[:, None])
        dp2 = jnp.asarray(np.repeat(dp[1], nW)[:, None])
    else:
        dp1 = dp2 = jnp.ones((BW, 1), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(BW, N, C)), jnp.float32)

    geo = WindowGeometry(
        batch=B, dims=dims, window=window, shift=shift,
        fragments=(1, 7, 7), num_heads=h, head_dim=hd, use_frag=use_frag,
    )
    gate = (
        jnp.asarray(S.fragment_gate(dims, (1, 7, 7), window, shift))
        if use_frag else None
    )
    mask_np = S.compute_shift_mask(dims, window, shift)
    mask = None if mask_np is None else jnp.asarray(mask_np)

    def loss_kernel(x, params, rel, frag):
        out = train_swin_block(
            x, params, rel, frag, geo, dp1, dp2,
            scale=hd ** -0.5, interpret=True,
        )
        return jnp.sum(out * cot)

    def loss_golden(x, params, rel, frag):
        out = _golden_block(
            x, params, rel, frag, gate, mask, dp1, dp2, h, hd ** -0.5
        )
        return jnp.sum(out * cot)

    argnums = (0, 1, 2) if frag is None else (0, 1, 2, 3)
    vk, gk = jax.value_and_grad(loss_kernel, argnums=argnums)(
        x, params, rel, frag
    )
    vg, gg = jax.value_and_grad(loss_golden, argnums=argnums)(
        x, params, rel, frag
    )

    np.testing.assert_allclose(float(vk), float(vg), rtol=2e-5)
    names = ["dx", "dparams", "drel", "dfrag"][: len(argnums)]
    for name, a, b in zip(names, gk, gg):
        fa = jax.tree_util.tree_leaves(a)
        fb = jax.tree_util.tree_leaves(b)
        for la, lb in zip(fa, fb):
            scale_ref = max(1e-3, float(jnp.abs(lb).max()))
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb),
                atol=5e-4 * scale_ref, rtol=2e-3,
                err_msg=f"{name} mismatch",
            )


def test_swin_train_pallas_grads_match_xla_path():
    """Full SwinTransformer3D TRAIN-path equivalence: use_pallas routes
    blocks through train_swin_block (fused fwd + fused bwd custom_vjp);
    values and every parameter gradient must match the XLA train path."""
    import kvq_tpu.ops.window_attention as WA

    kw = dict(
        embed_dim=16, depths=(2,), num_heads=(2,), window_size=(2, 7, 7),
        frag_biases=(True,), jump_attention=(False,),
        use_checkpoint=False, drop_path_rate=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 4, 28, 28, 3)), jnp.float32
    )
    m_xla = S.SwinTransformer3D(config=S.SwinConfig(**kw), dtype=jnp.float32)
    v = m_xla.init(jax.random.key(0), {"technical": x}, train=True)

    def loss_xla(params):
        out = m_xla.apply(
            {"params": params}, {"technical": x}, train=True
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    vx, gx = jax.value_and_grad(loss_xla)(v["params"])

    orig_tsb = WA.train_swin_block
    orig_blk = WA.fused_swin_block

    def interp_tsb(*args, **kwargs):
        kwargs["interpret"] = True
        return orig_tsb(*args, **kwargs)

    def interp_blk(*args, **kwargs):
        kwargs["interpret"] = True
        return orig_blk(*args, **kwargs)

    WA.train_swin_block = interp_tsb
    WA.fused_swin_block = interp_blk
    WA.ALLOW_CPU_PALLAS = True
    try:
        m_pal = S.SwinTransformer3D(
            config=S.SwinConfig(use_pallas=True, **kw), dtype=jnp.float32
        )

        def loss_pal(params):
            out = m_pal.apply(
                {"params": params}, {"technical": x}, train=True
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        vp, gp = jax.value_and_grad(loss_pal)(v["params"])
    finally:
        WA.train_swin_block = orig_tsb
        WA.fused_swin_block = orig_blk
        WA.ALLOW_CPU_PALLAS = False

    np.testing.assert_allclose(float(vp), float(vx), rtol=2e-5)
    fx, tx = jax.tree_util.tree_flatten_with_path(gx)[0], None
    fp = jax.tree_util.tree_flatten_with_path(gp)[0]
    assert len(fx) == len(fp)
    for (kx, lx), (kp, lp) in zip(fx, fp):
        assert kx == kp
        # near-zero leaves (e.g. LN bias grads: sums of thousands of
        # near-cancelling terms) get an absolute floor — relative error
        # there is fp-noise amplification, not kernel error
        scale_ref = float(jnp.abs(lx).max())
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(lx),
            atol=2e-5 + 1e-3 * scale_ref, rtol=5e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(kx)}",
        )


def test_train_block_bwd_major_mode_matches_golden(monkeypatch):
    """Force the bwd kernel's pattern-major 2-D grid (the plan real eval
    shapes use, and what the pb-shrink fallback produces for wide stages):
    weight-gradient accumulators must survive the slow-axis pattern sweep
    and bias-cache refills."""
    import kvq_tpu.ops.window_attention as WA

    monkeypatch.setattr(
        WA, "_train_bwd_pb",
        lambda geo, C, hidden: (1, 0),
    )

    dims, window, shift = (4, 14, 14), (2, 7, 7), (1, 3, 3)
    B, h, hd = 2, 2, 8
    C, hidden = h * hd, 4 * h * hd
    N = 98
    nW = 8
    BW = B * nW
    rng = np.random.default_rng(11)
    params = {
        k: jnp.asarray(rng.normal(size=s, scale=0.3), jnp.float32)
        for k, s in [
            ("qkv_w", (C, 3 * C)), ("proj_w", (C, C)),
            ("fc1_w", (C, hidden)), ("fc2_w", (hidden, C)),
        ]
    }
    for k, s in [("norm1_scale", (C,)), ("norm2_scale", (C,))]:
        params[k] = jnp.asarray(1 + 0.1 * rng.normal(size=s), jnp.float32)
    for k, s in [("norm1_bias", (C,)), ("norm2_bias", (C,)),
                 ("qkv_b", (3 * C,)), ("proj_b", (C,)),
                 ("fc1_b", (hidden,)), ("fc2_b", (C,))]:
        params[k] = jnp.asarray(0.1 * rng.normal(size=s), jnp.float32)
    x = jnp.asarray(rng.normal(size=(BW, N, C)), jnp.float32)
    rel = jnp.asarray(rng.normal(size=(h, N, N), scale=0.5), jnp.float32)
    frag = jnp.asarray(rng.normal(size=(h, N, N), scale=0.5), jnp.float32)
    dp1 = dp2 = jnp.ones((BW, 1), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(BW, N, C)), jnp.float32)

    geo = WindowGeometry(
        batch=B, dims=dims, window=window, shift=shift,
        fragments=(1, 7, 7), num_heads=h, head_dim=hd, use_frag=True,
    )
    gate = jnp.asarray(S.fragment_gate(dims, (1, 7, 7), window, shift))
    mask = jnp.asarray(S.compute_shift_mask(dims, window, shift))

    def loss_kernel(x, params, rel, frag):
        out = train_swin_block(
            x, params, rel, frag, geo, dp1, dp2,
            scale=hd ** -0.5, interpret=True,
        )
        return jnp.sum(out * cot)

    def loss_golden(x, params, rel, frag):
        out = _golden_block(
            x, params, rel, frag, gate, mask, dp1, dp2, h, hd ** -0.5
        )
        return jnp.sum(out * cot)

    vk, gk = jax.value_and_grad(loss_kernel, argnums=(0, 1, 2, 3))(
        x, params, rel, frag
    )
    vg, gg = jax.value_and_grad(loss_golden, argnums=(0, 1, 2, 3))(
        x, params, rel, frag
    )
    np.testing.assert_allclose(float(vk), float(vg), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gg)):
        scale_ref = float(jnp.abs(b).max())
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=2e-5 + 5e-4 * scale_ref, rtol=2e-3,
        )


def test_fold_softmax_extreme_logits_no_nan():
    """The fold path drops the per-row max subtraction; if every score in
    a row sits below exp's f32 underflow (~-87) the probability sum
    flushes to 0 — the 1e-37 floor must keep outputs finite (the classic
    row-max scheme can't hit this; the fold scheme can on adversarially
    trained weights)."""
    from kvq_tpu.ops.window_attention import fused_swin_block

    dims, window, shift = (4, 14, 14), (2, 7, 7), (0, 0, 0)
    B, h, hd = 1, 2, 8
    C, hidden = h * hd, 2 * h * hd
    N, nW = 98, 8
    BW = B * nW
    rng = np.random.default_rng(5)
    # zero qkv weights + constant q/k biases make every score EXACTLY
    # q.k*scale = -200: after bias folding each row's max exp argument is
    # <= -200, far below f32 underflow, so the whole sum flushes to 0
    scale = hd ** -0.5
    qkv_b = np.zeros((3 * C,), np.float32)
    qkv_b[:C] = 1.0                       # q lanes
    qkv_b[C: 2 * C] = -200.0 / (hd * scale)  # k lanes
    params = {
        "norm1_scale": jnp.ones((C,), jnp.float32),
        "norm1_bias": jnp.zeros((C,), jnp.float32),
        "qkv_w": jnp.zeros((C, 3 * C), jnp.float32),
        "qkv_b": jnp.asarray(qkv_b),
        "proj_w": jnp.asarray(rng.normal(size=(C, C), scale=0.1),
                              jnp.float32),
        "proj_b": jnp.zeros((C,), jnp.float32),
        "norm2_scale": jnp.ones((C,), jnp.float32),
        "norm2_bias": jnp.zeros((C,), jnp.float32),
        "fc1_w": jnp.asarray(rng.normal(size=(C, hidden), scale=0.1),
                             jnp.float32),
        "fc1_b": jnp.zeros((hidden,), jnp.float32),
        "fc2_w": jnp.asarray(rng.normal(size=(hidden, C), scale=0.1),
                             jnp.float32),
        "fc2_b": jnp.zeros((C,), jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(BW, N, C)), jnp.float32)
    # bias rows spanning hundreds of logits: after rowmax folding the
    # fold path's exp arguments go far below the f32 underflow line
    rel = jnp.asarray(-400.0 * rng.random(size=(h, N, N)), jnp.float32)

    geo = WindowGeometry(
        batch=B, dims=dims, window=window, shift=shift,
        fragments=(1, 7, 7), num_heads=h, head_dim=hd, use_frag=False,
    )
    out = fused_swin_block(
        x, params, rel, None, geo, scale=hd ** -0.5, interpret=True,
    )
    assert bool(jnp.all(jnp.isfinite(out))), "NaN/inf leaked from fold path"


def test_fold_clamp_zeroes_saturated_score_gradients():
    """Logits past the fold clamp: the bwd kernel must zero ds on the
    saturated entries (d min(exp(s), K)/ds = 0 there).  Ground truth =
    autodiff through the clamped golden.  This test caught a real r4 bug:
    the shipped zeroing clamped the exp ARGUMENT at 60 and compared pn
    against exp(60)*rinv, assuming the scalar exp equals the vectorized
    exp — on the TPU backend they differ by ~5.7e-6, so the zeroing
    NEVER engaged and saturated entries fed ds = pn*(dpn-dsum) into
    drel/dq/dk.  The clamp is now p-space with an exact power of two
    (_CLAMP_P), making the detection product bitwise-identical on every
    backend.

    Construction keeps every score FAR from the clamp boundary (so the
    kernel's and the golden's ~1e-3 score differences cannot flip an
    entry's classification): q is a constant +-1 ``pattern`` via the q
    bias; k = a * LN(x); "aligned" tokens are x = pattern (+ small
    orthogonal noise) giving s ~ +90 (saturated) or -90 (underflowed),
    all other tokens are per-head-slice orthogonalized against the
    pattern giving s ~ 0."""
    from kvq_tpu.ops.window_attention import _FOLD_CLAMP

    dims, window, shift = (4, 14, 14), (2, 7, 7), (0, 0, 0)
    B, h, hd = 1, 2, 8
    C, hidden = h * hd, 2 * h * hd
    N = window[0] * window[1] * window[2]
    nW = 8
    BW = B * nW
    scale = hd ** -0.5
    rng = np.random.default_rng(7)

    pattern = np.tile([1.0, -1.0], C // 2).astype(np.float32)
    s_target = 90.0                      # saturated score, 30 past clamp
    a = s_target / (hd * scale)
    qkv_w = np.zeros((C, 3 * C), np.float32)
    qkv_w[:, C:2 * C] = a * np.eye(C)   # k block
    qkv_w[:, 2 * C:] = np.eye(C)        # v block
    qkv_b = np.zeros((3 * C,), np.float32)
    qkv_b[:C] = pattern                  # q lanes: constant query
    params = {
        "norm1_scale": jnp.ones((C,), jnp.float32),
        "norm1_bias": jnp.zeros((C,), jnp.float32),
        "qkv_w": jnp.asarray(qkv_w),
        "qkv_b": jnp.asarray(qkv_b),
        "proj_w": jnp.asarray(rng.normal(size=(C, C), scale=0.2),
                              jnp.float32),
        "proj_b": jnp.zeros((C,), jnp.float32),
        "norm2_scale": jnp.ones((C,), jnp.float32),
        "norm2_bias": jnp.zeros((C,), jnp.float32),
        "fc1_w": jnp.asarray(rng.normal(size=(C, hidden), scale=0.2),
                             jnp.float32),
        "fc1_b": jnp.zeros((hidden,), jnp.float32),
        "fc2_w": jnp.asarray(rng.normal(size=(hidden, C), scale=0.2),
                             jnp.float32),
        "fc2_b": jnp.zeros((C,), jnp.float32),
    }

    # tokens: orthogonalize each head slice against the pattern slice so
    # random tokens score EXACTLY 0 per head (the pattern slice sums to
    # zero, so LN's mean-subtraction cannot reintroduce a component)
    xr = rng.normal(size=(BW, N, C)).astype(np.float32)
    for hh in range(h):
        sl = slice(hh * hd, (hh + 1) * hd)
        ps = pattern[sl]
        proj = (xr[..., sl] @ ps) / hd
        xr[..., sl] -= proj[..., None] * ps
    sat_cols = np.arange(0, 24, 2)       # 12 saturated columns
    neg_cols = np.arange(1, 8, 2)        # 4 underflowed columns
    x_np = xr.copy()
    x_np[:, sat_cols] = pattern + 0.05 * xr[:, sat_cols]
    x_np[:, neg_cols] = -pattern + 0.05 * xr[:, neg_cols]
    x = jnp.asarray(x_np)
    rel = jnp.zeros((h, N, N), jnp.float32)

    # margin guard: saturated columns sit far above the clamp, the rest
    # far below — implementation-level score differences (~1e-3) cannot
    # flip a classification
    xhat = x_np - x_np.mean(-1, keepdims=True)
    xhat = xhat / np.sqrt(x_np.var(-1) + 1e-6)[..., None]
    for hh in range(h):
        sl = slice(hh * hd, (hh + 1) * hd)
        sj = scale * a * (xhat[..., sl] @ pattern[sl])  # (BW, N)
        assert sj[:, sat_cols].min() > _FOLD_CLAMP + 20
        rest = np.delete(sj, sat_cols, axis=1)
        assert rest.max() < _FOLD_CLAMP - 20

    geo = WindowGeometry(
        batch=B, dims=dims, window=window, shift=shift,
        fragments=(1, 7, 7), num_heads=h, head_dim=hd, use_frag=False,
    )
    dp1 = dp2 = jnp.ones((BW, 1), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(BW, N, C)), jnp.float32)

    def loss_kernel(x, params, rel):
        out = train_swin_block(
            x, params, rel, None, geo, dp1, dp2, scale=scale,
            interpret=True,
        )
        return jnp.sum(out * cot)

    def loss_golden(x, params, rel, clamp):
        out = _golden_block(
            x, params, rel, None, None, None, dp1, dp2, h, scale,
            clamp=clamp,
        )
        return jnp.sum(out * cot)

    vk, gk = jax.value_and_grad(loss_kernel, argnums=(0, 1, 2))(
        x, params, rel
    )
    vg, gg = jax.value_and_grad(loss_golden, argnums=(0, 1, 2))(
        x, params, rel, _FOLD_CLAMP
    )

    # the test discriminates: WITHOUT the clamp the golden feeds real
    # gradient through the saturated entries' scores (what a reverted
    # kernel would emit), WITH it those entries are exactly zero
    dr_unclamped = np.asarray(
        jax.grad(loss_golden, argnums=2)(x, params, rel, None)
    )
    dr_clamped = np.asarray(gg[2])
    assert np.abs(dr_unclamped[:, :, sat_cols]).max() > 1e-2
    assert np.abs(dr_clamped[:, :, sat_cols]).max() < 1e-6

    np.testing.assert_allclose(float(vk), float(vg), rtol=2e-5)
    for name, a_, b_ in zip(["dx", "dparams", "drel"], gk, gg):
        fa = jax.tree_util.tree_leaves(a_)
        fb = jax.tree_util.tree_leaves(b_)
        for la, lb in zip(fa, fb):
            scale_ref = max(1e-3, float(jnp.abs(lb).max()))
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb),
                atol=5e-4 * scale_ref, rtol=2e-3,
                err_msg=f"{name} mismatch under saturated logits",
            )
