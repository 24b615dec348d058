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
