"""Video Swin Transformer 3D with relative + fragment position biases.

TPU-native redesign of the reference's FastVQA-style Swin-3D
(swin_backbone.py:92-1107, duplicated in KSVQE_model.py:33-753):

  - shifted-window attention runs as batched matmuls over (B*nW, N, C)
    windows — MXU-shaped, softmax accumulated in float32;
  - the reference's ``lru_cache``d mask/fragment-index builders
    (compute_mask swin_backbone.py:559-586, global_position_index :21-50)
    become *host-side numpy precomputation of static shapes*, embedded as
    trace-time constants — no data-dependent control flow under jit;
  - gradient checkpointing (reference use_checkpoint=True default) maps to
    ``flax.linen.remat`` per block;
  - cyclic shift is ``jnp.roll``; padding/unpadding is static.

Replicated reference quirks (deliberate, for checkpoint parity):
  - the relative-position index table is built for the *config* window and
    sliced ``[:N, :N]`` when the effective window is clamped by a small
    input (swin_backbone.py:264-266);
  - the fragment gate is ``sum(|Δfrag_coord|)`` — an unclamped count that
    scales the relative bias for windows spanning >1 fragment
    (swin_backbone.py:291-302).
"""

from __future__ import annotations

import dataclasses
import functools
from functools import lru_cache, reduce
from operator import mul

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import Mlp, DropPath, PatchEmbed3D, PatchMerging, trunc_normal_init


# ---------------------------------------------------------------------------
# static (host/numpy) geometry helpers


def _pallas_backend_ok() -> bool:
    """Mosaic kernels need a TPU backend; tests force the CPU interpreter
    by monkeypatching the kernels AND setting ALLOW_CPU_PALLAS."""
    from ..ops import window_attention as WA

    return jax.default_backend() == "tpu" or getattr(
        WA, "ALLOW_CPU_PALLAS", False
    )


def get_window_size(x_size, window_size, shift_size=None):
    """Clamp window (and zero shift) on dims where input <= window
    (reference swin_backbone.py:145-158)."""
    use_window = list(window_size)
    use_shift = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_window[i] = x_size[i]
            if use_shift is not None:
                use_shift[i] = 0
    if use_shift is None:
        return tuple(use_window)
    return tuple(use_window), tuple(use_shift)


@lru_cache(maxsize=None)
def get_adaptive_window_size(base_window_size, input_x_size, base_x_size):
    """Scale a base window proportionally to the input size (reference
    swin_backbone.py:53-61; without its debug print).  All-static — the
    result feeds trace-time geometry."""
    return tuple(
        (w * xi) // xb
        for w, xi, xb in zip(base_window_size, input_x_size, base_x_size)
    )


@lru_cache(maxsize=None)
def relative_position_index(window_size: tuple[int, int, int]) -> np.ndarray:
    """(N, N) gather indices into the (2Wd-1)(2Wh-1)(2Ww-1) bias table
    (reference swin_backbone.py:212-238)."""
    wd, wh, ww = window_size
    coords = np.stack(
        np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)


def _window_partition_np(x: np.ndarray, window_size) -> np.ndarray:
    """(D, H, W, C)-like numpy partition -> (nW, N, C)."""
    d, h, w = x.shape[:3]
    wd, wh, ww = window_size
    c = x.shape[3:]
    x = x.reshape(d // wd, wd, h // wh, wh, w // ww, ww, *c)
    x = x.transpose(0, 2, 4, 1, 3, 5, *range(6, x.ndim))
    return x.reshape(-1, wd * wh * ww, *c)


@lru_cache(maxsize=None)
def compute_shift_mask(
    dims: tuple[int, int, int],
    window_size: tuple[int, int, int],
    shift_size: tuple[int, int, int],
) -> np.ndarray | None:
    """(nW, N, N) additive mask with -100 across shifted-window seams
    (reference compute_mask, swin_backbone.py:559-586)."""
    if not any(shift_size):
        return None
    D, H, W = dims
    img_mask = np.zeros((D, H, W, 1), dtype=np.float32)
    cnt = 0
    for d in (
        slice(-window_size[0]),
        slice(-window_size[0], -shift_size[0] if shift_size[0] else None),
        slice(-shift_size[0], None) if shift_size[0] else slice(0, 0),
    ):
        for h in (
            slice(-window_size[1]),
            slice(-window_size[1], -shift_size[1] if shift_size[1] else None),
            slice(-shift_size[1], None) if shift_size[1] else slice(0, 0),
        ):
            for w in (
                slice(-window_size[2]),
                slice(-window_size[2], -shift_size[2] if shift_size[2] else None),
                slice(-shift_size[2], None) if shift_size[2] else slice(0, 0),
            ):
                img_mask[d, h, w, :] = cnt
                cnt += 1
    windows = _window_partition_np(img_mask, window_size)[..., 0]  # (nW, N)
    mask = windows[:, None, :] - windows[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


@lru_cache(maxsize=None)
def _axis_token_ids(
    dims: tuple[int, int, int],
    window_size: tuple[int, int, int],
    shift_size: tuple[int, int, int],
    fragments: tuple[int, int, int],
):
    """Small per-axis token id tables for on-device gate/mask construction.

    Returns (frag_ids, seg_ids): each a tuple of 3 arrays of shape
    (wgrid_axis, N) — the fragment id / seam segment of every token of
    every window position along that axis.  A few KB of constants instead
    of the (nW, N, N) gate/mask literals (which at eval shapes exceed the
    serialized-program limits and HBM budget).
    """
    N = window_size[0] * window_size[1] * window_size[2]
    wd, wh, ww = window_size
    tok = np.arange(N)
    offs = (tok // (wh * ww), (tok // ww) % wh, tok % ww)
    frag_ids = []
    seg_ids = []
    for ax in range(3):
        dim, w, s, f = dims[ax], window_size[ax], shift_size[ax], fragments[ax]
        grid = dim // w
        starts = np.arange(grid) * w
        g = starts[:, None] + offs[ax][None, :]  # (grid, N) rolled coords
        orig = (g + s) % dim
        frag_ids.append((orig * f // dim).astype(np.int32))
        seg = np.where(g < dim - w, 0, np.where(g < dim - s, 1, 2) if s else 0)
        seg_ids.append(seg.astype(np.int32))
    return tuple(frag_ids), tuple(seg_ids)


def fragment_gate_device(dims, fragments, window_size, shift_size):
    """(nW, N, N) gate computed on device from per-axis constants;
    numerically identical to :func:`fragment_gate`."""
    frag_ids, _ = _axis_token_ids(dims, window_size, shift_size, fragments)
    parts = []
    for ids in frag_ids:
        a = jnp.asarray(ids, jnp.float32)
        parts.append(jnp.abs(a[:, None, :] - a[:, :, None]))  # (grid, N, N)
    Dd, Dh, Dw = parts
    gate = (
        Dd[:, None, None]
        + Dh[None, :, None]
        + Dw[None, None, :]
    )  # (gd, gh, gw, N, N)
    n = gate.shape[0] * gate.shape[1] * gate.shape[2]
    return gate.reshape(n, gate.shape[3], gate.shape[4])


def shift_mask_device(dims, window_size, shift_size):
    """(nW, N, N) additive seam mask on device (or None when unshifted)."""
    if not any(shift_size):
        return None
    _, seg_ids = _axis_token_ids(
        dims, window_size, shift_size, (1, 1, 1)
    )
    sd, sh, sw = (jnp.asarray(s, jnp.int32) for s in seg_ids)
    seg = (
        sd[:, None, None] * 9 + sh[None, :, None] * 3 + sw[None, None, :]
    )  # (gd, gh, gw, N)
    n = seg.shape[0] * seg.shape[1] * seg.shape[2]
    seg = seg.reshape(n, -1)
    return jnp.where(
        seg[:, None, :] != seg[:, :, None], jnp.float32(-100.0), jnp.float32(0.0)
    )


@lru_cache(maxsize=None)
def fragment_gate(
    dims: tuple[int, int, int],
    fragments: tuple[int, int, int],
    window_size: tuple[int, int, int],
    shift_size: tuple[int, int, int],
) -> np.ndarray:
    """(nW, N, N) gate = sum |Δ fragment coordinate| between token pairs.

    numpy equivalent of reference global_position_index + fgate
    (swin_backbone.py:21-50, 293-295): fragment ids come from
    nearest-neighbor upsampling of the fragment grid to the padded token
    volume, rolled by the cyclic shift.
    """
    D, H, W = dims
    fd, fh, fw = fragments
    # torch F.interpolate nearest: src index = floor(dst * size_in / size_out)
    di = (np.arange(D) * fd // D).astype(np.int64)
    hi = (np.arange(H) * fh // H).astype(np.int64)
    wi = (np.arange(W) * fw // W).astype(np.int64)
    coords = np.stack(
        np.meshgrid(di, hi, wi, indexing="ij"), axis=-1
    ).astype(np.float32)  # (D, H, W, 3)
    coords = np.roll(
        coords, shift=(-shift_size[0], -shift_size[1], -shift_size[2]), axis=(0, 1, 2)
    )
    win = _window_partition_np(coords, window_size)  # (nW, N, 3)
    rel = win[:, None, :, :] - win[:, :, None, :]
    return np.abs(rel).sum(-1).astype(np.float32)  # (nW, N, N)


# ---------------------------------------------------------------------------
# modules


@lru_cache(maxsize=None)
def _axis_offset_onehots(window: tuple[int, int, int]):
    """Per-axis one-hot tensors M[a, b, r] = [a - b + w - 1 == r] — the
    separable structure of the relative-position index."""
    outs = []
    for w in window:
        m = np.zeros((w, w, 2 * w - 1), np.float32)
        for a in range(w):
            for b in range(w):
                m[a, b, a - b + w - 1] = 1.0
        outs.append(m)
    return tuple(outs)


def _bias_table_grad(dp, window):
    """dtable[t, h] = sum over {(i, j): rpi[i, j] == t} of dp[h, i, j],
    computed as three SMALL dense contractions over the separable axis
    offsets instead of an XLA scatter-add.  The scatter form serialized
    ~153k duplicate-index updates per (head, block) and measured
    ~22.6 ms of the KSVQE train step (tools/profile_trunk_train.py with
    tables stop-gradiented); this form is a few MMACs on the MXU."""
    wd, wh, ww = window
    hn = dp.shape[0]
    Md, Mh, Mw = (jnp.asarray(m) for m in _axis_offset_onehots(window))
    X = dp.reshape(hn, wd, wh, ww, wd, wh, ww)
    t = jnp.einsum("hdxyevw,dea->haxyvw", X, Md)   # d1 x d2 -> rd
    t = jnp.einsum("haxyvw,xvb->habyw", t, Mh)     # h1 x h2 -> rh
    t = jnp.einsum("habyw,ywc->habc", t, Mw)       # w1 x w2 -> rw
    # (h, 2wd-1, 2wh-1, 2ww-1) -> (table_len, h): index layout matches
    # relative_position_index (rd-major, then rh, then rw)
    return t.reshape(hn, -1).T


def _expand_bias_planes_gather(table, window, n):
    rpi = relative_position_index(window)[:n, :n]
    planes = jnp.asarray(table, jnp.float32)[rpi.reshape(-1)]
    return planes.reshape(n, n, table.shape[-1]).transpose(2, 0, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _expand_bias_planes_cv(table, window, n):
    return _expand_bias_planes_gather(table, window, n)


def _ebp_fwd(table, window, n):
    # residual: zero-size carrier of the table's dtype (residuals must be
    # JAX types; the cotangent has to match the primal dtype)
    return (
        _expand_bias_planes_gather(table, window, n),
        jnp.zeros((0,), table.dtype),
    )


def _ebp_bwd(window, n, res, dp):
    return (_bias_table_grad(dp, window).astype(res.dtype),)


_expand_bias_planes_cv.defvjp(_ebp_fwd, _ebp_bwd)


def expand_bias_planes(table, table_window, n):
    """(table_len, h) bias table -> (h, n, n) per-window planes via the
    relative-position gather (reference swin_backbone.py:264-266, incl.
    the [:N, :N] clamp-slice quirk).  When the slice is the identity
    (n == prod(table_window) — every production stage) the backward runs
    the separable matmul contraction instead of XLA's scatter-add; the
    sliced case keeps autodiff's scatter (exotic clamped geometries
    only)."""
    wd, wh, ww = table_window
    if n == wd * wh * ww:
        return _expand_bias_planes_cv(table, tuple(table_window), n)
    return _expand_bias_planes_gather(table, table_window, n)


class WindowAttention3D(nn.Module):

    """W-MSA over flattened windows with dual position-bias tables.

    ``table_window`` sizes the learned tables (config window); the actual
    token count N may be smaller when the effective window is clamped.
    """

    num_heads: int
    table_window: tuple[int, int, int]
    frag_bias: bool = False
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, mask=None, fgate=None, *, train: bool = False, geometry=None
    ):
        # x: (B, nW, N, C); mask: (nW, N, N) or None; fgate: (nW, N, N) or None
        # geometry: ops.window_attention.WindowGeometry to run the fused
        # Pallas kernel (eval path) instead of the XLA composition.
        B, nW, N, C = x.shape
        h = self.num_heads
        hd = C // h
        scale = hd**-0.5
        wd, wh, ww = self.table_window
        table_len = (2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1)

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)

        rel_table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(0.02),
            (table_len, h),
        )
        # includes the reference's [:N, :N] clamp-slice quirk; backward
        # is a separable matmul contraction, not a scatter
        rel_bias = expand_bias_planes(rel_table, self.table_window, N)

        frag_planes = None
        if self.frag_bias and (fgate is not None or geometry is not None):
            frag_table = self.param(
                "fragment_position_bias_table",
                trunc_normal_init(0.02),
                (table_len, h),
            )
            frag_planes = expand_bias_planes(
                frag_table, self.table_window, N
            )

        if geometry is not None and not train:
            from ..ops.window_attention import flash_window_attention_packed

            # single transpose to (BW, 3h, N, hd); q/k/v + head selection
            # happen via BlockSpec index maps inside the kernel
            packed = jnp.swapaxes(
                qkv.reshape(B * nW, N, 3 * h, hd), 1, 2
            )
            out = flash_window_attention_packed(
                packed,
                h,
                rel_bias.astype(jnp.float32),
                None if frag_planes is None else frag_planes.astype(jnp.float32),
                geometry,
                scale=scale,
            )
            out = out.reshape(B, nW, h, N, hd)
        elif geometry is not None and self.attn_drop == 0.0:
            # training: differentiable flash kernel (custom_vjp) — the XLA
            # composition materializes (B*nW, h, N, N) scores to HBM in
            # fwd and (with remat) twice more in bwd
            from ..ops.window_attention import window_attention_train

            qkv5 = qkv.reshape(B * nW, N, 3, h, hd).transpose(0, 2, 3, 1, 4)
            out = window_attention_train(
                qkv5[:, 0], qkv5[:, 1], qkv5[:, 2],
                rel_bias.astype(jnp.float32),
                None if frag_planes is None else frag_planes.astype(jnp.float32),
                geometry,
                scale=scale,
            )
            out = out.reshape(B, nW, h, N, hd)
        else:
            qkv = qkv.reshape(B, nW, N, 3, h, hd)
            q, k, v = (qkv[..., i, :, :] for i in range(3))  # (B,nW,N,h,hd)
            q = jnp.swapaxes(q, -3, -2)  # (B,nW,h,N,hd)
            k = jnp.swapaxes(k, -3, -2)
            v = jnp.swapaxes(v, -3, -2)
            attn = jnp.einsum(
                "bwhnd,bwhmd->bwhnm", q * scale, k,
                preferred_element_type=jnp.float32,
            )
            if frag_planes is not None and fgate is not None:
                g = fgate[:, None, :, :]  # (nW, 1, N, N)
                bias = rel_bias[None] * g + frag_planes[None] * (1.0 - g)
            else:
                bias = rel_bias[None]  # (1, h, N, N)
            attn = attn + bias[None]  # (B, nW, h, N, N)
            if mask is not None:
                attn = attn + mask[None, :, None, :, :]
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
            out = jnp.einsum(
                "bwhnm,bwhmd->bwhnd", attn.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            )

        out = jnp.swapaxes(out, -3, -2).reshape(B, nW, N, C).astype(self.dtype)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        return out


def window_partition(x, window_size):
    """(B, D, H, W, C) -> (B, nW, N, C)."""
    B, D, H, W, C = x.shape
    wd, wh, ww = window_size
    x = x.reshape(B, D // wd, wd, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(B, -1, wd * wh * ww, C)


def window_reverse(windows, window_size, B, D, H, W):
    wd, wh, ww = window_size
    x = windows.reshape(B, D // wd, H // wh, W // ww, wd, wh, ww, -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, -1)


def fused_block_vmem_bytes(probe, C: int, hidden: int) -> int:
    """VMEM footprint estimate of the fused eval/train-forward block
    kernel: fp32 rel/frag bias planes plus the per-pattern bias cache
    (ops.window_attention._plan_bias_cache), bf16 block weights
    (qkv+proj+4x MLP), double-buffered token tiles (mirrors the G
    selection in fused_swin_block), plus ~1 MB of reused scratch.  The
    kernel raises Mosaic's scoped-VMEM ceiling to 100 MB (v5e has
    128 MB); SwinBlock3D gates on 80 MB for compiler-temporary headroom.
    Shared by the gate and its test (tests/test_swin.py)."""
    from ..ops.window_attention import _plan_bias_cache

    N = probe.n_tokens
    _, _, cache_pats = _plan_bias_cache(probe)
    if not (probe.use_frag or probe.shift[1] or probe.shift[2]):
        cache_pats = 0  # kernel reads the rel plane directly, no cache
    per_window = 2 * N * C * 2
    g_tiles = next(
        (g * per_window for g in (8, 4, 2, 1)
         if g * per_window <= 4 * 1024 * 1024),
        per_window,
    )
    return (
        (1 + int(probe.use_frag) + cache_pats)
        * probe.num_heads * N * N * 4
        + (4 * C * C + 2 * C * hidden) * 2
        + g_tiles
        + 1024 * 1024
    )


class SwinBlock3D(nn.Module):
    """One (S)W-MSA + MLP block (reference SwinTransformerBlock3D,
    swin_backbone.py:329-520)."""

    num_heads: int
    window_size: tuple[int, int, int]
    shift: bool
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    frag_bias: bool = False
    jump_attention: bool = False
    fragments_hw: int = 7
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def _fused_block(self, x, window, shift, train: bool = False):
        """Whole-block Pallas path: one HBM round trip for the token
        tensor.  Only taken when the spatial dims tile the window exactly
        (the XLA path zero-pads AFTER norm1, which the fused kernel cannot
        replicate) and the fp32 bias planes fit VMEM.

        train=True routes through :func:`train_swin_block` — the same
        forward kernel (plus per-window DropPath multipliers) under a
        custom_vjp whose backward is one fused Pallas kernel producing
        every gradient (ops/window_attention.py)."""
        from ..ops.window_attention import (
            WindowGeometry,
            fused_swin_block,
            train_swin_block,
        )

        B, D, H, W, C = x.shape
        h = self.num_heads
        N = window[0] * window[1] * window[2]
        p = self.variables["params"]
        ap = p["attn"]

        rel_bias = expand_bias_planes(
            ap["relative_position_bias_table"], self.window_size, N
        )
        frag_bias = None
        if self.frag_bias:
            frag_bias = expand_bias_planes(
                ap["fragment_position_bias_table"], self.window_size, N
            )

        dt = self.dtype
        params = {
            "norm1_scale": p["norm1"]["scale"],
            "norm1_bias": p["norm1"]["bias"],
            "qkv_w": ap["qkv"]["kernel"].astype(dt),
            "qkv_b": (
                ap["qkv"]["bias"]
                if self.qkv_bias
                else jnp.zeros((3 * C,), jnp.float32)
            ),
            "proj_w": ap["proj"]["kernel"].astype(dt),
            "proj_b": ap["proj"]["bias"],
            "norm2_scale": p["norm2"]["scale"],
            "norm2_bias": p["norm2"]["bias"],
            "fc1_w": p["mlp"]["fc1"]["kernel"].astype(dt),
            "fc1_b": p["mlp"]["fc1"]["bias"],
            "fc2_w": p["mlp"]["fc2"]["kernel"].astype(dt),
            "fc2_b": p["mlp"]["fc2"]["bias"],
        }
        geometry = WindowGeometry(
            batch=B,
            dims=(D, H, W),
            window=window,
            shift=shift,
            fragments=(1, self.fragments_hw, self.fragments_hw),
            num_heads=h,
            head_dim=C // h,
            use_frag=self.frag_bias,
        )
        y = x.astype(dt)
        if any(shift):
            y = jnp.roll(y, shift=(-shift[0], -shift[1], -shift[2]),
                         axis=(1, 2, 3))
        y = window_partition(y, window)  # (B, nW, N, C)
        nW = y.shape[1]
        if train:
            # per-sample DropPath multipliers (mask/keep), repeated across
            # each sample's windows — same semantics as layers.DropPath
            if self.drop_path > 0.0:
                keep = 1.0 - self.drop_path
                rng1, rng2 = jax.random.split(self.make_rng("dropout"))
                m1 = jax.random.bernoulli(rng1, keep, (B,)) / keep
                m2 = jax.random.bernoulli(rng2, keep, (B,)) / keep
                dp1 = jnp.repeat(m1.astype(jnp.float32), nW)[:, None]
                dp2 = jnp.repeat(m2.astype(jnp.float32), nW)[:, None]
            else:
                dp1 = dp2 = jnp.ones((B * nW, 1), jnp.float32)
            out = train_swin_block(
                y.reshape(B * nW, N, C), params, rel_bias, frag_bias,
                geometry, dp1, dp2, scale=(C // h) ** -0.5,
            )
        else:
            out = fused_swin_block(
                y.reshape(B * nW, N, C), params, rel_bias, frag_bias,
                geometry, scale=(C // h) ** -0.5,
            )
        out = window_reverse(out.reshape(B, nW, N, C), window, B, D, H, W)
        if any(shift):
            out = jnp.roll(out, shift=shift, axis=(1, 2, 3))
        return out

    @nn.compact
    def __call__(self, x, train: bool = False):
        # `train` is positional (not kw-only) so nn.remat can mark it static.
        B, D, H, W, C = x.shape
        cfg_shift = tuple(w // 2 for w in self.window_size) if self.shift else (0, 0, 0)
        window, shift = get_window_size((D, H, W), self.window_size, cfg_shift)

        N = window[0] * window[1] * window[2]
        no_pad = D % window[0] == 0 and H % window[1] == 0 and W % window[2] == 0
        from ..ops.window_attention import WindowGeometry

        probe = WindowGeometry(
            batch=B, dims=(D, H, W), window=window, shift=shift,
            fragments=(1, self.fragments_hw, self.fragments_hw),
            num_heads=self.num_heads, head_dim=C // self.num_heads,
            use_frag=self.frag_bias,
        )
        hidden = int(C * self.mlp_ratio)
        vmem_est = fused_block_vmem_bytes(probe, C, hidden)
        can_fuse = (
            self.use_pallas
            and not self.jump_attention
            and no_pad
            and not self.is_initializing()
            and "params" in self.variables
            and "norm1" in self.variables["params"]
            and _pallas_backend_ok()
        )
        if can_fuse and not train and vmem_est <= 80 * 1024 * 1024:
            return self._fused_block(x, window, shift)
        if can_fuse and train and self.attn_drop == 0.0 and self.drop == 0.0:
            from ..ops.window_attention import train_block_vmem_bytes

            # The train forward runs fused_swin_block at the full eval-plan
            # slab depth, so BOTH estimates must fit: the fwd kernel's
            # (vmem_est, same bound as the eval gate) and the bwd kernel's
            # (which shrinks its bias-slab depth independently).
            if (
                vmem_est <= 80 * 1024 * 1024
                and train_block_vmem_bytes(
                    probe, C, int(C * self.mlp_ratio)
                ) <= 80 * 1024 * 1024
            ):
                return self._fused_block(x, window, shift, train=True)

        if not self.jump_attention:
            y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
            pad_d = (window[0] - D % window[0]) % window[0]
            pad_h = (window[1] - H % window[1]) % window[1]
            pad_w = (window[2] - W % window[2]) % window[2]
            if pad_d or pad_h or pad_w:
                y = jnp.pad(
                    y, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0))
                )
            Dp, Hp, Wp = D + pad_d, H + pad_h, W + pad_w

            if any(shift):
                y = jnp.roll(y, shift=(-shift[0], -shift[1], -shift[2]),
                             axis=(1, 2, 3))

            geometry = None
            mask_j = fgate_j = None
            if (
                self.use_pallas
                and (not train or self.attn_drop == 0.0)
                and _pallas_backend_ok()
            ):
                from ..ops.window_attention import WindowGeometry

                geometry = WindowGeometry(
                    batch=B,
                    dims=(Dp, Hp, Wp),
                    window=window,
                    shift=shift,
                    fragments=(1, self.fragments_hw, self.fragments_hw),
                    num_heads=self.num_heads,
                    head_dim=C // self.num_heads,
                    use_frag=self.frag_bias,
                )
            else:
                # built on device from small per-axis constants — the naive
                # (nW, N, N) numpy literals blow up the serialized program
                # at eval shapes (236 MB per block)
                mask_j = shift_mask_device((Dp, Hp, Wp), window, shift)
                fgate_j = (
                    fragment_gate_device(
                        (Dp, Hp, Wp),
                        (1, self.fragments_hw, self.fragments_hw),
                        window,
                        shift,
                    )
                    if self.frag_bias
                    else None
                )

            y = window_partition(y, window)  # (B, nW, N, C)
            y = WindowAttention3D(
                num_heads=self.num_heads,
                table_window=self.window_size,
                frag_bias=self.frag_bias,
                qkv_bias=self.qkv_bias,
                attn_drop=self.attn_drop,
                proj_drop=self.drop,
                dtype=self.dtype,
                name="attn",
            )(y, mask_j, fgate_j, train=train, geometry=geometry)
            y = window_reverse(y, window, B, Dp, Hp, Wp)
            if any(shift):
                y = jnp.roll(y, shift=shift, axis=(1, 2, 3))
            if pad_d or pad_h or pad_w:
                y = y[:, :D, :H, :W]
            x = x + DropPath(self.drop_path, name="drop_path1")(y, train=train)

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(
            hidden_features=int(C * self.mlp_ratio),
            drop=self.drop,
            dtype=self.dtype,
            name="mlp",
        )(y, train=train)
        return x + DropPath(self.drop_path, name="drop_path2")(y, train=train)


class BasicLayer(nn.Module):
    """One stage: depth blocks (alternating shift) + optional PatchMerging
    (reference swin_backbone.py:585-667)."""

    depth: int
    num_heads: int
    window_size: tuple[int, int, int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_paths: tuple[float, ...] = ()
    downsample: bool = True
    frag_bias: bool = False
    jump_attention: bool = False
    fragments_hw: int = 7
    use_checkpoint: bool = True
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        block_cls = SwinBlock3D
        if self.use_checkpoint:
            block_cls = nn.remat(SwinBlock3D, static_argnums=(2,))
        for i in range(self.depth):
            blk = block_cls(
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift=i % 2 == 1,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=self.drop_paths[i] if self.drop_paths else 0.0,
                frag_bias=self.frag_bias,
                jump_attention=self.jump_attention,
                fragments_hw=self.fragments_hw,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )
            x = blk(x, train)
        if self.downsample:
            x = PatchMerging(dtype=self.dtype, name="downsample")(x)
        return x


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    depths: tuple[int, ...] = (2, 2, 6, 2)
    num_heads: tuple[int, ...] = (3, 6, 12, 24)
    window_size: tuple[int, int, int] = (8, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    frag_biases: tuple[bool, ...] = (True, True, True, False)
    jump_attention: tuple[bool, ...] = (False, False, False, False)
    fragments_hw: int = 7
    use_checkpoint: bool = True
    use_pallas: bool = False
    input_key: str = "technical"


def swin_config(key: str, backbone_cfg: dict | None) -> SwinConfig:
    """Model-key presets (reference models/model.py:30-47)."""
    backbone_cfg = backbone_cfg or {}
    presets = {
        # swin_3d_tiny: frag biases off (KSVQE_model.py:1593 / swin_backbone.py:1088)
        "swin_tiny": dict(frag_biases=(False,) * 4),
        # FastVQA reproduction: full defaults with fragment biases
        "swin_tiny_grpb": dict(),
        # FastVQA-M: small windows, no fragment bias
        "swin_tiny_grpb_m": dict(window_size=(4, 4, 4), frag_biases=(False,) * 4),
        "swin_small": dict(depths=(2, 2, 18, 2), frag_biases=(False,) * 4),
    }
    kw = presets[key]
    if "window_size" in backbone_cfg:
        kw["window_size"] = tuple(backbone_cfg["window_size"])
    if "checkpoint" in backbone_cfg:
        kw["use_checkpoint"] = bool(backbone_cfg["checkpoint"])
    if "use_pallas" in backbone_cfg:
        kw["use_pallas"] = bool(backbone_cfg["use_pallas"])
    return SwinConfig(**kw)


def make_stages(cfg: "SwinConfig", dtype, named: bool = False) -> list:
    """Build the per-stage BasicLayer modules for a SwinConfig.

    Shared between the plain Swin trunk and KSVQE (which interleaves CDM
    modulation between stages — see nn/ksvqe.py).  With ``named=False`` the
    modules are auto-named by setup() attribute assignment."""
    dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.depths))
    stages = []
    for i, depth in enumerate(cfg.depths):
        start = sum(cfg.depths[:i])
        stages.append(
            BasicLayer(
                depth=depth,
                num_heads=cfg.num_heads[i],
                window_size=cfg.window_size,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                drop=cfg.drop_rate,
                attn_drop=cfg.attn_drop_rate,
                drop_paths=tuple(float(d) for d in dpr[start : start + depth]),
                downsample=i < len(cfg.depths) - 1,
                frag_bias=bool(cfg.frag_biases[i]),
                jump_attention=bool(cfg.jump_attention[i]),
                fragments_hw=cfg.fragments_hw,
                use_checkpoint=cfg.use_checkpoint,
                use_pallas=cfg.use_pallas,
                dtype=dtype,
                name=f"layers_{i}" if named else None,
            )
        )
    return stages


class SwinTrunk(nn.Module):
    """The 4-stage trunk on embedded tokens; returns all stage outputs."""

    config: SwinConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = [x]
        for stage in make_stages(self.config, self.dtype, named=True):
            x = stage(x, train=train)
            feats.append(x)
        return feats


class SwinTransformer3D(nn.Module):
    """Patch embed + trunk + final LayerNorm; reads ``batch['technical']``
    like the reference (swin_backbone.py:1044-1080).

    Accepts either the batch dict or a raw (B, T, H, W, C) array.
    """

    config: SwinConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch, *, train: bool = False):
        cfg = self.config
        x = batch[cfg.input_key] if isinstance(batch, dict) else batch
        x = x.astype(self.dtype)
        x = PatchEmbed3D(
            patch_size=cfg.patch_size,
            embed_dim=cfg.embed_dim,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = nn.Dropout(cfg.drop_rate, deterministic=not train)(x)
        feats = SwinTrunk(config=cfg, dtype=self.dtype, name="trunk")(
            x, train=train
        )
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(feats[-1])
        return x  # (B, D', H', W', num_features)


def swin_2d_tiny(dtype=jnp.float32, **overrides) -> "SwinTransformer3D":
    """2D Swin-Tiny trunk (reference SwinTransformer2D,
    swin_backbone.py:1098-1103 — timm swin_tiny_patch4_window7_224 minus the
    classifier head).

    TPU-first equivalent: the 3D machinery specialized to a temporal window
    and patch of 1, which makes every block an exact per-frame 2D shifted
    window attention (no temporal mixing) while reusing the fused kernels.
    """
    cfg = SwinConfig(
        patch_size=(1, 4, 4),
        window_size=(1, 7, 7),
        frag_biases=(False,) * 4,
        **overrides,
    )
    return SwinTransformer3D(config=cfg, dtype=dtype)
