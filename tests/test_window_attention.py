"""Pallas flash-window-attention: equivalence with the XLA composition.

The kernel runs in interpreter mode on CPU; on TPU the same code path is
compiled by Mosaic (exercised by bench.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kvq_tpu.nn import swin as S
from kvq_tpu.ops.window_attention import WindowGeometry, flash_window_attention

pytestmark = pytest.mark.slow  # model-assembly/e2e: minutes on small hosts


def test_device_gate_matches_numpy():
    for dims, window, shift in [
        ((4, 14, 14), (2, 7, 7), (0, 0, 0)),
        ((4, 14, 14), (2, 7, 7), (1, 3, 3)),
        ((8, 28, 28), (2, 7, 7), (1, 3, 3)),
    ]:
        g_np = S.fragment_gate(dims, (1, 7, 7), window, shift)
        g_dev = np.asarray(
            S.fragment_gate_device(dims, (1, 7, 7), window, shift)
        )
        np.testing.assert_array_equal(g_dev, g_np)


def test_device_mask_matches_numpy():
    for dims, window, shift in [
        ((4, 14, 14), (2, 7, 7), (1, 3, 3)),
        ((8, 28, 28), (2, 7, 7), (1, 3, 3)),
        ((4, 14, 14), (2, 7, 7), (0, 3, 3)),  # clamped d-axis
    ]:
        m_np = S.compute_shift_mask(dims, window, shift)
        m_dev = np.asarray(S.shift_mask_device(dims, window, shift))
        np.testing.assert_array_equal(m_dev, m_np)
    assert S.shift_mask_device((4, 14, 14), (2, 7, 7), (0, 0, 0)) is None


def _reference_window_attention(q, k, v, rel, frag, gate, mask, scale):
    """XLA composition (the WindowAttention3D math) as golden."""
    attn = np.einsum("whnd,whmd->whnm", q * scale, k).astype(np.float32)
    if frag is not None:
        bias = rel[None] * gate[:, None] + frag[None] * (1 - gate[:, None])
    else:
        bias = rel[None]
    attn = attn + bias
    if mask is not None:
        attn = attn + mask[:, None]
    attn = attn - attn.max(-1, keepdims=True)
    p = np.exp(attn)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("whnm,whmd->whnd", p, v)


@pytest.mark.parametrize(
    "dims,shift,use_frag",
    [
        ((4, 14, 14), (0, 0, 0), True),
        ((4, 14, 14), (1, 3, 3), True),
        ((4, 14, 14), (1, 3, 3), False),
    ],
)
def test_flash_kernel_matches_xla(dims, shift, use_frag):
    window = (2, 7, 7)
    B, h, hd = 2, 2, 8
    N = 2 * 7 * 7
    Dw = dims[0] // 2
    Hw = dims[1] // 7
    Ww = dims[2] // 7
    nW = Dw * Hw * Ww
    rng = np.random.default_rng(0)
    q = rng.normal(size=(B * nW, h, N, hd)).astype(np.float32)
    k = rng.normal(size=(B * nW, h, N, hd)).astype(np.float32)
    v = rng.normal(size=(B * nW, h, N, hd)).astype(np.float32)
    rel = rng.normal(size=(h, N, N)).astype(np.float32)
    frag = rng.normal(size=(h, N, N)).astype(np.float32) if use_frag else None

    geo = WindowGeometry(
        batch=B,
        dims=dims,
        window=window,
        shift=shift,
        fragments=(1, 7, 7),
        num_heads=h,
        head_dim=hd,
        use_frag=use_frag,
    )
    out = np.asarray(
        flash_window_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(rel),
            None if frag is None else jnp.asarray(frag),
            geo,
            scale=hd**-0.5,
            interpret=True,
        )
    )

    gate = S.fragment_gate(dims, (1, 7, 7), window, shift)
    mask = S.compute_shift_mask(dims, window, shift)
    for b in range(B):
        expected = _reference_window_attention(
            q[b * nW : (b + 1) * nW],
            k[b * nW : (b + 1) * nW],
            v[b * nW : (b + 1) * nW],
            rel,
            frag,
            gate,
            mask,
            hd**-0.5,
        )
        np.testing.assert_allclose(
            out[b * nW : (b + 1) * nW], expected, atol=2e-5, rtol=1e-4
        )


def test_swin_pallas_flag_matches_xla_path():
    """Full block equivalence: SwinTransformer3D with use_pallas
    (interpret-mode kernel) vs the XLA path."""
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
    v = m_xla.init(jax.random.key(0), {"technical": x}, train=False)
    out_xla = m_xla.apply(v, {"technical": x}, train=False)

    orig = WA.flash_window_attention_packed
    orig_blk = WA.fused_swin_block

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    def interp_blk(*args, **kwargs):
        kwargs["interpret"] = True
        return orig_blk(*args, **kwargs)

    WA.flash_window_attention_packed = interp
    WA.fused_swin_block = interp_blk
    WA.ALLOW_CPU_PALLAS = True
    try:
        m_pal = S.SwinTransformer3D(
            config=S.SwinConfig(use_pallas=True, **kw), dtype=jnp.float32
        )
        out_pal = m_pal.apply(v, {"technical": x}, train=False)
    finally:
        WA.flash_window_attention_packed = orig
        WA.fused_swin_block = orig_blk
        WA.ALLOW_CPU_PALLAS = False
    np.testing.assert_allclose(
        np.asarray(out_xla), np.asarray(out_pal), atol=2e-4, rtol=1e-3
    )


def test_fused_block_major_mode_matches_resident():
    """Force the pattern-major 2-D grid (normally only reached at real eval
    shapes where P*h*N*N*4 exceeds the cache budget) and check it against
    the resident-mode output on identical inputs."""
    import kvq_tpu.ops.window_attention as WA

    dims, window = (4, 28, 28), (2, 7, 7)
    B, h, C = 2, 2, 16
    N = 2 * 7 * 7
    nW = (dims[0] // 2) * (dims[1] // 7) * (dims[2] // 7)
    rng = np.random.default_rng(3)
    hidden = 4 * C
    params = {
        "norm1_scale": jnp.ones((C,), jnp.float32),
        "norm1_bias": jnp.zeros((C,), jnp.float32),
        "qkv_w": jnp.asarray(rng.normal(size=(C, 3 * C), scale=0.1), jnp.float32),
        "qkv_b": jnp.zeros((3 * C,), jnp.float32),
        "proj_w": jnp.asarray(rng.normal(size=(C, C), scale=0.1), jnp.float32),
        "proj_b": jnp.zeros((C,), jnp.float32),
        "norm2_scale": jnp.ones((C,), jnp.float32),
        "norm2_bias": jnp.zeros((C,), jnp.float32),
        "fc1_w": jnp.asarray(rng.normal(size=(C, hidden), scale=0.1), jnp.float32),
        "fc1_b": jnp.zeros((hidden,), jnp.float32),
        "fc2_w": jnp.asarray(rng.normal(size=(hidden, C), scale=0.1), jnp.float32),
        "fc2_b": jnp.zeros((C,), jnp.float32),
    }
    rel = jnp.asarray(rng.normal(size=(h, N, N)), jnp.float32)
    frag = jnp.asarray(rng.normal(size=(h, N, N)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B * nW, N, C)), jnp.float32)

    for shift in [(0, 0, 0), (1, 3, 3)]:
        geo = WindowGeometry(
            batch=B, dims=dims, window=window, shift=shift,
            fragments=(1, 7, 7), num_heads=h, head_dim=C // h,
            use_frag=True,
        )
        from kvq_tpu.ops.window_attention import fused_swin_block

        p_eff, mode, _ = WA._plan_bias_cache(geo)
        assert mode == "resident" and p_eff == 16
        ref = np.asarray(
            fused_swin_block(x, params, rel, frag, geo, interpret=True)
        )
        old = WA.BIAS_CACHE_BUDGET
        WA.BIAS_CACHE_BUDGET = 8 * h * N * N * 4  # cache 8 of 16 patterns
        try:
            assert WA._plan_bias_cache(geo)[1] == "major"
            out = np.asarray(
                fused_swin_block(x, params, rel, frag, geo, interpret=True)
            )
        finally:
            WA.BIAS_CACHE_BUDGET = old
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def _xla_window_attention(q, k, v, rel, frag, gate, mask, scale):
    """Differentiable jnp version of the XLA composition (golden for both
    values and gradients of the train kernel)."""
    attn = jnp.einsum(
        "whnd,whmd->whnm", q * scale, k, preferred_element_type=jnp.float32
    )
    if frag is not None:
        bias = rel[None] * gate[:, None] + frag[None] * (1 - gate[:, None])
    else:
        bias = rel[None]
    attn = attn + bias
    if mask is not None:
        attn = attn + mask[:, None]
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum(
        "whnm,whmd->whnd", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )


@pytest.mark.parametrize(
    "dims,shift,use_frag",
    [
        ((4, 14, 14), (0, 0, 0), True),
        ((4, 14, 14), (1, 3, 3), True),
        ((4, 14, 14), (1, 3, 3), False),
        ((4, 28, 28), (1, 3, 3), True),
    ],
)
def test_train_kernel_values_and_grads_match_xla(dims, shift, use_frag):
    import kvq_tpu.ops.window_attention as WA

    window = (2, 7, 7)
    B, h, hd = 2, 2, 8
    N = 2 * 7 * 7
    nW = (dims[0] // 2) * (dims[1] // 7) * (dims[2] // 7)
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B * nW, h, N, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B * nW, h, N, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B * nW, h, N, hd)), jnp.float32)
    rel = jnp.asarray(rng.normal(size=(h, N, N)), jnp.float32)
    frag = (
        jnp.asarray(rng.normal(size=(h, N, N)), jnp.float32)
        if use_frag else None
    )
    w = jnp.asarray(rng.normal(size=(B * nW, h, N, hd)), jnp.float32)

    geo = WindowGeometry(
        batch=B, dims=dims, window=window, shift=shift,
        fragments=(1, 7, 7), num_heads=h, head_dim=hd, use_frag=use_frag,
    )
    gate = jnp.asarray(S.fragment_gate(dims, (1, 7, 7), window, shift))
    mask_np = S.compute_shift_mask(dims, window, shift)
    mask = None if mask_np is None else jnp.asarray(mask_np)

    def loss_ref(q, k, v, rel, frag):
        outs = []
        for b in range(B):
            sl = slice(b * nW, (b + 1) * nW)
            outs.append(_xla_window_attention(
                q[sl], k[sl], v[sl], rel, frag, gate, mask, hd ** -0.5
            ))
        return jnp.sum(jnp.concatenate(outs) * w)

    def loss_ker(q, k, v, rel, frag):
        from kvq_tpu.ops.window_attention import window_attention_train

        out = window_attention_train(q, k, v, rel, frag, geo)
        return jnp.sum(out * w)

    WA.TRAIN_INTERPRET = True
    try:
        argnums = (0, 1, 2, 3, 4) if use_frag else (0, 1, 2, 3)
        vr, gr = jax.value_and_grad(loss_ref, argnums)(q, k, v, rel, frag)
        vk, gk = jax.value_and_grad(loss_ker, argnums)(q, k, v, rel, frag)
    finally:
        WA.TRAIN_INTERPRET = False

    np.testing.assert_allclose(float(vk), float(vr), rtol=2e-5)
    names = ["dq", "dk", "dv", "drel", "dfrag"]
    for name, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
            err_msg=f"{name} mismatch ({dims}, shift={shift}, frag={use_frag})",
        )


def test_swin_train_kernel_param_grads_match_xla_path():
    """Full train-path gradients: SwinTransformer3D with the custom_vjp
    attention kernel (interpret mode) vs the XLA composition."""
    import kvq_tpu.ops.window_attention as WA

    kw = dict(
        embed_dim=16, depths=(2,), num_heads=(2,), window_size=(2, 7, 7),
        frag_biases=(True,), jump_attention=(False,),
        use_checkpoint=True, drop_path_rate=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(1, 4, 28, 28, 3)), jnp.float32
    )
    m_xla = S.SwinTransformer3D(config=S.SwinConfig(**kw), dtype=jnp.float32)
    v = m_xla.init(jax.random.key(0), {"technical": x}, train=True)

    def loss_xla(p):
        out = m_xla.apply(
            {**v, "params": p}, {"technical": x}, train=True,
            rngs={"dropout": jax.random.key(1)},
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    m_pal = S.SwinTransformer3D(
        config=S.SwinConfig(use_pallas=True, **kw), dtype=jnp.float32
    )

    def loss_pal(p):
        out = m_pal.apply(
            {**v, "params": p}, {"technical": x}, train=True,
            rngs={"dropout": jax.random.key(1)},
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    WA.TRAIN_INTERPRET = True
    WA.ALLOW_CPU_PALLAS = True
    try:
        lx, gx = jax.value_and_grad(loss_xla)(v["params"])
        lp, gp = jax.value_and_grad(loss_pal)(v["params"])
    finally:
        WA.TRAIN_INTERPRET = False
        WA.ALLOW_CPU_PALLAS = False

    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-5)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(gp))

    def _pstr(path):
        return "/".join(str(getattr(q, "key", q)) for q in path)

    for path, leaf in flat_x:
        other = gp
        for part in path:
            other = other[part.key]
        np.testing.assert_allclose(
            np.asarray(other), np.asarray(leaf), atol=1e-3, rtol=5e-3,
            err_msg=f"param grad mismatch at {_pstr(path)}",
        )


def test_flash_nobias_matches_xla():
    """No-bias batched flash attention (the CDM attentions): packed
    (N=M=48, pack>1) and unpacked (large Nq cross) shapes vs the XLA
    composition."""
    from kvq_tpu.ops.window_attention import (
        _plan_nobias, flash_attention_nobias,
    )

    rng = np.random.default_rng(0)
    for X, h, N, M, hd in [
        (16, 2, 48, 48, 32),   # temporal self shape (pack=8)
        (8, 3, 112, 49, 32),   # distortion cross (pack=4)
        (4, 2, 560, 56, 32),   # large-Nq cross (pack=1)
        (14, 2, 48, 48, 16),   # odd divisor chain
    ]:
        q = jnp.asarray(rng.normal(size=(X, h, N, hd)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(X, h, M, hd)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(X, h, M, hd)), jnp.float32)
        scale = hd ** -0.5
        s = jnp.einsum("xhnd,xhmd->xhnm", q * scale, k,
                       preferred_element_type=jnp.float32)
        ref = jnp.einsum("xhnm,xhmd->xhnd", jax.nn.softmax(s, -1), v)
        out = flash_attention_nobias(q, k, v, scale=scale, interpret=True)
        pack, group = _plan_nobias(X, N, M, hd, 4)
        assert X % (pack * group) == 0
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3,
            err_msg=f"shape {(X, h, N, M, hd)} pack={pack} group={group}",
        )
        # channel-layout variant: same math from (X, N, C) inputs
        from kvq_tpu.ops.window_attention import flash_attention_nobias_cl

        C = h * hd
        qc = q.transpose(0, 2, 1, 3).reshape(X, N, C)
        kc = k.transpose(0, 2, 1, 3).reshape(X, M, C)
        vc = v.transpose(0, 2, 1, 3).reshape(X, M, C)
        out_cl = flash_attention_nobias_cl(
            qc, kc, vc, num_heads=h, scale=scale, interpret=True
        )
        ref_cl = np.asarray(ref).transpose(0, 2, 1, 3).reshape(X, N, C)
        np.testing.assert_allclose(
            np.asarray(out_cl), ref_cl, atol=2e-4, rtol=1e-3,
            err_msg=f"cl shape {(X, h, N, M, hd)}",
        )
        # production dtype: bf16 inputs, softmax still in f32 inside the
        # kernel — output must stay within bf16-matmul noise of the f32
        # reference (KSVQE runs compute_dtype=bfloat16)
        out_bf = flash_attention_nobias_cl(
            qc.astype(jnp.bfloat16), kc.astype(jnp.bfloat16),
            vc.astype(jnp.bfloat16), num_heads=h, scale=scale,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_bf, np.float32), ref_cl, atol=4e-2, rtol=2e-2,
            err_msg=f"cl bf16 shape {(X, h, N, M, hd)}",
        )


def test_cdm_pallas_modules_match_xla():
    """CrossAttention / TemporalAttention use_pallas flag (interpret-mode
    kernel) vs their XLA path on the same weights."""
    import kvq_tpu.ops.window_attention as WA
    from kvq_tpu.nn.cdm import CrossAttention, TemporalAttention

    rng = np.random.default_rng(1)
    xq = jnp.asarray(rng.normal(size=(8, 48, 32)), jnp.float32)
    xkv = jnp.asarray(rng.normal(size=(8, 49, 32)), jnp.float32)

    cross = CrossAttention(num_heads=2)
    cv = cross.init(jax.random.key(0), xq, xkv)
    out_xla, _ = cross.apply(cv, xq, xkv)

    tatt = TemporalAttention(num_heads=2)
    tv = tatt.init(jax.random.key(1), xq)
    t_xla = tatt.apply(tv, xq)

    orig = WA.flash_attention_nobias_cl

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    WA.flash_attention_nobias_cl = interp
    WA.ALLOW_CPU_PALLAS = True
    try:
        out_pal, attn = CrossAttention(num_heads=2, use_pallas=True).apply(
            cv, xq, xkv
        )
        assert attn is None  # kernel path does not materialize probs
        t_pal = TemporalAttention(num_heads=2, use_pallas=True).apply(tv, xq)
    finally:
        WA.flash_attention_nobias_cl = orig
        WA.ALLOW_CPU_PALLAS = False

    np.testing.assert_allclose(
        np.asarray(out_xla), np.asarray(out_pal), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(t_xla), np.asarray(t_pal), atol=2e-4, rtol=1e-3
    )
