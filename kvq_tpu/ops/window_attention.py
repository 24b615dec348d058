"""Pallas flash window attention for Video-Swin with dual position biases.

The hot kernel of the stack (SURVEY.md §7.3): shifted-window attention over
(8,7,7) windows with a relative position bias mixed against a fragment
position bias by a window-dependent gate, plus the shifted-window seam mask.

Why a kernel: XLA materializes the (B·nW·h, N, N) attention scores to HBM
between the two matmuls (N=392) — at eval stage 1 that is ~700 MB of extra
traffic per block each way.  This kernel fuses
QK^T -> bias-mix -> mask -> softmax -> AV entirely in VMEM.

TPU-native trick: the fragment gate and the seam mask are *functions of
token coordinates* — instead of streaming precomputed (nW, N, N) gate/mask
arrays from HBM (which would cost more than it saves), both are
reconstructed in-kernel from broadcasted iotas:

  - token (d,h,w) offsets inside the window  ->  global rolled coords
  - fragment id  f = ((g + shift) mod Dim) * F // Dim       (gate)
  - seam segment s = 0 | 1 | 2 by g against Dim-window/Dim-shift  (mask)

Only q/k/v tiles and the per-head (N, N) relative/fragment bias planes are
read from HBM; the bias planes are re-fetched only when the head index
changes (grid is window-fastest, so Pallas keeps them resident in VMEM).

This module carries THREE kernel families: (a) the flash window-attention
kernel above (eval, and the attention core some tests compare against),
(b) the fused whole-block eval kernel ``fused_swin_block`` (LN->qkv->
attention->proj->residual->LN->MLP->residual in one HBM round-trip), and
(c) the differentiable fused TRAIN block ``train_swin_block`` — a
``custom_vjp`` whose backward is one Pallas kernel per block that
recomputes the forward flash-style and emits dx plus every weight
gradient.  Numerical equivalence with the XLA composition is covered by
tests/test_window_attention.py and tests/test_train_block.py.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass(frozen=True)
class WindowGeometry:
    batch: int
    dims: tuple[int, int, int]        # padded token volume (Dp, Hp, Wp)
    window: tuple[int, int, int]      # effective window (wd, wh, ww)
    shift: tuple[int, int, int]       # effective shift
    fragments: tuple[int, int, int]   # fragment grid (1, 7, 7)
    num_heads: int
    head_dim: int
    use_frag: bool

    @property
    def n_tokens(self) -> int:
        wd, wh, ww = self.window
        return wd * wh * ww

    @property
    def wgrid(self) -> tuple[int, int, int]:
        return tuple(d // w for d, w in zip(self.dims, self.window))


def _coord_vectors(geo: WindowGeometry, d_idx, h_idx, w_idx):
    """Per-token (N,1) global rolled coords along each axis for the window
    at grid position (d_idx, h_idx, w_idx)."""
    wd, wh, ww = geo.window
    n = geo.n_tokens
    tok = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    od = tok // (wh * ww)
    oh = (tok // ww) % wh
    ow = tok % ww
    gd = d_idx * wd + od
    gh = h_idx * wh + oh
    gw = w_idx * ww + ow
    return gd, gh, gw


def _fragment_ids(g, shift, dim, frags):
    """fragment id of the *original* (pre-roll) coordinate."""
    orig = jax.lax.rem(g + shift, dim)
    return (orig * frags) // dim


def _segment_ids(g, window, shift, dim):
    """Seam segment in the rolled frame (compute_mask semantics)."""
    seg = jnp.where(g < dim - window, 0, jnp.where(g < dim - shift, 1, 2))
    return seg


def _pattern_gate_seam(geo: WindowGeometry, pat):
    """Fragment gate and h/w seam for window pattern ``pat`` (= h_idx*Ww +
    w_idx; both are independent of the batch and d-axis window position —
    the d fragment count is 1 and the d seam is handled separately).
    Returns (gate (N,N) f32 or None, seam_ok (N,N) bool or None)."""
    Dp, Hp, Wp = geo.dims
    sd, sh, sw = geo.shift
    fd, fh, fw = geo.fragments
    _, _, Ww = geo.wgrid
    wh, ww = geo.window[1], geo.window[2]
    h_idx = pat // Ww
    w_idx = jax.lax.rem(pat, Ww)
    gd, gh, gw = _coord_vectors(geo, 0, h_idx, w_idx)
    gate = seam = None
    if geo.use_frag:
        fhi = _fragment_ids(gh, sh, Hp, fh)
        fwi = _fragment_ids(gw, sw, Wp, fw)
        gate = jnp.abs(fhi - fhi.T) + jnp.abs(fwi - fwi.T)
        if fd > 1:  # single d window: fold its gate term too
            fdi = _fragment_ids(gd, sd, Dp, fd)
            gate = gate + jnp.abs(fdi - fdi.T)
        gate = gate.astype(jnp.float32)
    if sh or sw:
        segh = _segment_ids(gh, wh, sh, Hp)
        segw = _segment_ids(gw, ww, sw, Wp)
        seam = jnp.logical_and(segh == segh.T, segw == segw.T)
    return gate, seam


def _blend_bias(geo: WindowGeometry, gate, seam, relb, fragb):
    """The kernels' single bias-slab recipe: blend rel/frag tables by the
    fragment gate, then fold the h/w shift seam as a -100 logit penalty.
    Shared by the eval block kernel and the train fwd/bwd kernels so their
    bias semantics cannot drift apart."""
    if geo.use_frag:
        b = relb * gate + fragb * (1.0 - gate)
    else:
        b = relb + jnp.float32(0.0)
    if geo.shift[1] or geo.shift[2]:
        b = jnp.where(seam, b, b - 100.0)
    return b


def _check_frag_grid(geo: WindowGeometry):
    """All kernels reconstruct the fragment gate per (h,w) pattern with the
    d term folded only when there is a single d window (_pattern_gate_seam
    uses d_idx=0)."""
    if geo.use_frag and geo.fragments[0] > 1 and geo.wgrid[0] > 1:
        raise NotImplementedError(
            "d-axis fragment grids >1 with multiple d windows"
        )


def _make_kernel(geo: WindowGeometry, scale: float, group: int):
    """Kernel processing ``group`` consecutive windows (one head) per grid
    step.  Batching windows amortizes the per-step dispatch/DMA overhead,
    which dominates at small head dims (hd=32 -> ~40 MFLOP per window-head,
    a few microseconds of MXU time vs ~4 us of step overhead)."""
    Dp, Hp, Wp = geo.dims
    wd, wh, ww = geo.window
    sd, sh, sw = geo.shift
    fd, fh, fw = geo.fragments
    Dw, Hw, Ww = geo.wgrid
    P = Hw * Ww
    shifted = any(geo.shift)
    use_frag = geo.use_frag

    def kernel(q_ref, k_ref, v_ref, relb_ref, fragb_ref, out_ref):
        chunk = pl.program_id(1)  # window-chunk index (fastest grid dim)

        def body(g, _):
            w = chunk * group + g  # flattened (b, d, pat) window id
            pat = jax.lax.rem(w, P)
            d_idx = jax.lax.rem(w // P, Dw)
            h_idx = pat // Ww
            w_idx = jax.lax.rem(pat, Ww)

            gd, gh, gw = _coord_vectors(geo, d_idx, h_idx, w_idx)

            q = q_ref[g, 0]
            k = k_ref[g, 0]
            v = v_ref[g, 0]
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale

            if use_frag:
                fdi = _fragment_ids(gd, sd, Dp, fd)
                fhi = _fragment_ids(gh, sh, Hp, fh)
                fwi = _fragment_ids(gw, sw, Wp, fw)
                gate = (
                    jnp.abs(fdi - fdi.T)
                    + jnp.abs(fhi - fhi.T)
                    + jnp.abs(fwi - fwi.T)
                ).astype(jnp.float32)
                bias = relb_ref[0] * gate + fragb_ref[0] * (1.0 - gate)
            else:
                bias = relb_ref[0]
            s = s + bias

            if shifted:
                segd = _segment_ids(gd, wd, sd, Dp)
                segh = _segment_ids(gh, wh, sh, Hp)
                segw = _segment_ids(gw, ww, sw, Wp)
                seg = segd * 9 + segh * 3 + segw
                s = jnp.where(seg == seg.T, s, s - 100.0)

            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[g, 0] = out.astype(out_ref.dtype)
            return 0

        # fori_loop, not an unrolled python loop: the compiler then reuses
        # one s/p scratch across windows instead of live-ranging `group`
        # copies (which OOMs scoped VMEM at group>=16).
        jax.lax.fori_loop(0, group, body, 0)

    return kernel


def _pick_group(bw: int, n: int, hd: int, itemsize: int) -> int:
    """Largest window-group dividing ``bw`` whose qkv+out tiles fit a
    conservative VMEM budget (bias planes take 2*N*N*4 on top)."""
    budget = 4 * 1024 * 1024
    per_window = 4 * n * hd * itemsize  # q, k, v, out tiles
    for g in (8, 4, 2, 1):
        if bw % g == 0 and g * per_window <= budget:
            return g
    return 1


def flash_window_attention(
    q,
    k,
    v,
    rel_bias,
    frag_bias,
    geo: WindowGeometry,
    scale: float | None = None,
    interpret: bool = False,
):
    """q/k/v: (B*nW, h, N, hd); rel_bias/frag_bias: (h, N, N) float32
    (pre-gathered from the tables); returns (B*nW, h, N, hd).

    Grid is (heads, window-chunks) with chunks fastest, so the per-head bias
    planes stay VMEM-resident across a whole sweep of windows.
    """
    interpret = interpret or EVAL_INTERPRET
    BW, h, N, hd = q.shape
    assert N == geo.n_tokens, (N, geo.n_tokens)
    if scale is None:
        scale = hd ** -0.5

    if frag_bias is None:
        frag_bias = jnp.zeros_like(rel_bias)

    G = _pick_group(BW, N, hd, q.dtype.itemsize)

    def qkv_map(hh, chunk):
        return (chunk, hh, 0, 0)

    def bias_map(hh, chunk):
        return (hh, 0, 0)

    kernel = _make_kernel(geo, float(scale), G)
    grid = (h, BW // G)  # chunk fastest => bias resident per head
    spec_qkv = pl.BlockSpec((G, 1, N, hd), qkv_map, memory_space=pltpu.VMEM)
    spec_bias = pl.BlockSpec((1, N, N), bias_map, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_qkv, spec_qkv, spec_qkv, spec_bias, spec_bias],
        out_specs=pl.BlockSpec((G, 1, N, hd), qkv_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BW * h * N * N * hd,
            bytes_accessed=3 * BW * h * N * hd * q.dtype.itemsize
            + 2 * h * N * N * 4,
            transcendentals=BW * h * N * N,
        ),
        interpret=interpret,
    )(q, k, v, rel_bias, frag_bias)
    return out



def flash_window_attention_packed(
    qkv,
    num_heads: int,
    rel_bias,
    frag_bias,
    geo: WindowGeometry,
    scale: float | None = None,
    interpret: bool = False,
):
    """Packed-layout variant: qkv as (B*nW, 3*h, N, hd) — produced from the
    qkv projection by a single transpose (vs three slice+transpose chains
    for separate q/k/v) — q/k/v and the head are selected by BlockSpec
    index maps.  Returns (B*nW, h, N, hd)."""
    interpret = interpret or EVAL_INTERPRET
    BW, th, N, hd = qkv.shape
    h = num_heads
    assert th == 3 * h
    assert N == geo.n_tokens, (N, geo.n_tokens)
    if scale is None:
        scale = hd ** -0.5
    if frag_bias is None:
        frag_bias = jnp.zeros_like(rel_bias)

    G = _pick_group(BW, N, hd, qkv.dtype.itemsize)

    def in_map(i):
        def m(hh, chunk):
            return (chunk, i * h + hh, 0, 0)

        return m

    def out_map(hh, chunk):
        return (chunk, hh, 0, 0)

    def bias_map(hh, chunk):
        return (hh, 0, 0)

    kernel = _make_kernel(geo, float(scale), G)
    grid = (h, BW // G)
    specs = [
        pl.BlockSpec((G, 1, N, hd), in_map(i), memory_space=pltpu.VMEM)
        for i in range(3)
    ]
    spec_bias = pl.BlockSpec((1, N, N), bias_map, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs + [spec_bias, spec_bias],
        out_specs=pl.BlockSpec((G, 1, N, hd), out_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BW, h, N, hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BW * h * N * N * hd,
            bytes_accessed=BW * th * N * hd * qkv.dtype.itemsize
            + 2 * h * N * N * 4,
            transcendentals=BW * h * N * N,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, rel_bias, frag_bias)
    return out


# ---------------------------------------------------------------------------
# No-bias batched flash attention (the CDM attentions)


def _make_nobias_kernel(n: int, m: int, pack: int, group: int, scale: float):
    """Kernel step processing ``group`` packs of ``pack`` windows for one
    head.  The ``pack`` windows are fused into ONE (pack*n, hd) x
    (hd, pack*m) matmul with a block-diagonal mask — at CDM shapes
    (n = m = 48) a single window uses <40% of the MXU tile in every
    dimension, and XLA's batched-matmul lowering of ~19k such matmuls
    additionally round-trips the fp32 scores through HBM with 48->128
    lane padding (the measured superlinear B=1->4 regression,
    tools/profile_cdm_variants.py).  Packing recovers MXU geometry;
    masking keeps the math exactly per-window."""
    pn, pm = pack * n, pack * m

    def kernel(q_ref, k_ref, v_ref, out_ref):
        if pack > 1:
            row = jax.lax.broadcasted_iota(jnp.int32, (pn, pm), 0) // n
            col = jax.lax.broadcasted_iota(jnp.int32, (pn, pm), 1) // m
            blockmask = row == col

        def body(g, _):
            if pack > 1:
                # (pack, 1, n, hd) -> (pack*n, hd): sublane-tile stacking,
                # legal in Mosaic only because n, m are 8-aligned
                # (_plan_nobias guarantees it)
                q = q_ref[pl.ds(g * pack, pack), 0].reshape(pn, -1)
                k = k_ref[pl.ds(g * pack, pack), 0].reshape(pm, -1)
                v = v_ref[pl.ds(g * pack, pack), 0].reshape(pm, -1)
            else:
                q = q_ref[g, 0]
                k = k_ref[g, 0]
                v = v_ref[g, 0]
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if pack > 1:
                s = jnp.where(blockmask, s, -1e30)
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            # deferred normalization: divide the (pn, hd) AV output instead
            # of the (pn, pm) probabilities (one fewer full-score VPU pass)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / denom
            if pack > 1:
                out_ref[pl.ds(g * pack, pack), 0] = out.reshape(
                    pack, n, -1
                ).astype(out_ref.dtype)
            else:
                out_ref[g, 0] = out.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, group, body, 0)

    return kernel


def _plan_nobias(X: int, n: int, m: int, hd: int, itemsize: int,
                 pack_override: int | None = None):
    """(pack, group): fuse ``pack`` windows per matmul and iterate
    ``group`` packs per grid step (VMEM-bounded).  Packing trades MXU
    geometry (rows pack*n) against VPU softmax work (x pack on masked
    elements); pack=4 measured best at the CDM shapes
    (tools/profile_cdm_variants.py)."""
    pack = 1
    cands = (pack_override,) if pack_override else (4, 2)
    if n % 8 == 0 and m % 8 == 0:  # Mosaic reshape needs sublane alignment
        for p in cands:
            if X % p == 0 and p * n <= 512 and p * m <= 1024:
                pack = p
                break
    budget = 4 * 1024 * 1024
    per_window = (2 * n + 2 * m) * hd * itemsize
    group = 1
    for g in (16, 8, 4, 2):
        if (X // pack) % g == 0 and g * pack * per_window <= budget:
            group = g
            break
    return pack, group


def flash_attention_nobias(q, k, v, scale=None, interpret=False,
                           pack_override=None):
    """Batched multi-head attention with no bias/mask, scores kept in VMEM.

    q: (X, h, N, hd); k/v: (X, h, M, hd); returns (X, h, N, hd).
    Softmax statistics in fp32 (same numerics as the XLA composition up to
    fp32-accumulation order).  Forward-only — used by the CDM modules on
    the no-grad eval path (nn/cdm.py); training keeps the XLA form.
    """
    interpret = interpret or EVAL_INTERPRET
    X, h, N, hd = q.shape
    M = k.shape[2]
    assert k.shape == (X, h, M, hd) and v.shape == k.shape, (
        q.shape, k.shape, v.shape
    )
    if scale is None:
        scale = hd ** -0.5

    pack, group = _plan_nobias(X, N, M, hd, q.dtype.itemsize, pack_override)
    G = pack * group

    def qmap(hh, chunk):
        return (chunk, hh, 0, 0)

    kernel = _make_nobias_kernel(N, M, pack, group, float(scale))
    grid = (h, X // G)
    spec_q = pl.BlockSpec((G, 1, N, hd), qmap, memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((G, 1, M, hd), qmap, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_q, spec_kv, spec_kv],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * X * h * N * M * hd * pack,
            bytes_accessed=(2 * N + 2 * M) * X * h * hd * q.dtype.itemsize,
            transcendentals=X * h * N * M * pack,
        ),
        # same scoped-vmem headroom as the channel-layout variant (the
        # default 32 MB ceiling trips on long-sequence tiles at eval B>=8)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(q, k, v)


def _make_nobias_cl_kernel(n: int, m: int, heads: int, hd: int, pack: int,
                           group: int, scale: float):
    """Channel-layout variant of :func:`_make_nobias_kernel`: q/k/v arrive
    as (G, n|m, C) tiles straight from their Dense projections — heads are
    sliced along the lane (channel) axis in VMEM and head outputs are
    re-concatenated before the store, so NO (X, h, N, hd) transpose is
    ever materialized in HBM.  (The first, head-major kernel won at the
    module level but LOST in the full model: XLA folds the head transposes
    into its batched matmuls, while a kernel boundary forces three real
    HBM transposes — measured 56.3 -> 50.6 videos/s eval B=1.)"""
    pn, pm = pack * n, pack * m

    def kernel(q_ref, k_ref, v_ref, out_ref):
        if pack > 1:
            row = jax.lax.broadcasted_iota(jnp.int32, (pn, pm), 0) // n
            col = jax.lax.broadcasted_iota(jnp.int32, (pn, pm), 1) // m
            blockmask = row == col

        def body(g, _):
            if pack > 1:
                qg = q_ref[pl.ds(g * pack, pack)]
                kg = k_ref[pl.ds(g * pack, pack)]
                vg = v_ref[pl.ds(g * pack, pack)]
            else:
                qg = q_ref[g]
                kg = k_ref[g]
                vg = v_ref[g]
            outs = []
            for hh in range(heads):
                sl = slice(hh * hd, (hh + 1) * hd)
                if pack > 1:
                    q = qg[..., sl].reshape(pn, hd)
                    k = kg[..., sl].reshape(pm, hd)
                    v = vg[..., sl].reshape(pm, hd)
                else:
                    q = qg[:, sl]
                    k = kg[:, sl]
                    v = vg[:, sl]
                q = (q.astype(jnp.float32) * scale).astype(q_ref.dtype)
                s = jax.lax.dot_general(
                    q, k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if pack > 1:
                    s = jnp.where(blockmask, s, -1e30)
                mx = jnp.max(s, axis=-1, keepdims=True)
                # exp and the row sum stay in f32 (bf16 softmax arguments
                # would put ~0.4% noise on the DOMINANT logits); only the
                # probabilities fed to the MXU are cast down.
                pf = jnp.exp(s - mx)
                r = 1.0 / jnp.sum(pf, axis=-1, keepdims=True)
                p = pf.astype(q_ref.dtype)
                outs.append(
                    (jax.lax.dot_general(
                        p, v,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * r).astype(out_ref.dtype)
                )
            o = jnp.concatenate(outs, axis=-1)  # (pn, C)
            if pack > 1:
                out_ref[pl.ds(g * pack, pack)] = o.reshape(pack, n, -1)
            else:
                out_ref[g] = o
            return 0

        jax.lax.fori_loop(0, group, body, 0)

    return kernel


def flash_attention_nobias_cl(q, k, v, num_heads: int, scale=None,
                              interpret=False, pack_override=None):
    """Batched multi-head attention, channel layout: q (X, N, C),
    k/v (X, M, C) -> (X, N, C); heads split along C inside the kernel.

    The CDM eval path (nn/cdm.py) — scores never leave VMEM, no head
    transposes in HBM.  Forward-only.
    """
    X, N, C = q.shape
    interpret = interpret or EVAL_INTERPRET
    M = k.shape[1]
    assert k.shape == (X, M, C) and v.shape == k.shape, (
        q.shape, k.shape, v.shape
    )
    hd = C // num_heads
    assert hd * num_heads == C
    if scale is None:
        scale = hd ** -0.5

    pack, group = _plan_nobias(
        X, N, M, C, q.dtype.itemsize, pack_override
    )
    G = pack * group

    def tmap(chunk):
        return (chunk, 0, 0)

    kernel = _make_nobias_cl_kernel(
        N, M, num_heads, hd, pack, group, float(scale)
    )
    grid = (X // G,)
    spec_q = pl.BlockSpec((G, N, C), tmap, memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((G, M, C), tmap, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_q, spec_kv, spec_kv],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * X * N * M * C * pack,
            bytes_accessed=(2 * N + 2 * M) * X * C * q.dtype.itemsize,
            transcendentals=X * num_heads * N * M * pack,
        ),
        # the default 32 MB scoped-vmem ceiling trips at eval B>=8 (the
        # double-buffered (G, N, C) tiles of the long-sequence semantic
        # cross stage); v5e has 128 MB per core — match the block kernel
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(q, k, v)


# ---------------------------------------------------------------------------
# Fully fused Swin block kernel (eval path, small-head stages)

# VMEM budget for the per-pattern bias cache; module-level so tests can
# shrink it to force the pattern-major grid on small geometries.
BIAS_CACHE_BUDGET = 40 * 1024 * 1024
# Cache element type.  bf16 halves slab VMEM (doubling pattern residency —
# stages 0/1 of the eval geometry then fit 'resident' instead of 'major')
# at the cost of bias quantization (~0.4% of unit-scale logits); flipped by
# tools/profile_block_kernel.py to measure the tradeoff.
BIAS_CACHE_DTYPE = jnp.float32

# Softmax row-max handling in the EVAL block kernel.  "fold" subtracts each
# bias slab's per-row max at cache-build time — a per-row constant cancels
# in softmax — so the hot path fuses bias-add + exp into ONE elementwise
# pass over the (N, N) scores with no per-instance row-max reduction (exp
# stays in f32: folded arguments sit at score scale, where a bf16 cast
# would put ~0.4%-of-argument noise on the DOMINANT logits instead of the
# negligible ones).  "row" keeps the classic per-row max subtraction.
BLOCK_SOFTMAX = os.environ.get("KVQ_BLOCK_SOFTMAX", "fold")

# overflow clamp for the fold path's fused add+exp (no row max): e-base 60
# sits far above post-LN logit scale and well under the f32 exponent
# ceiling.
#
# Three softmax-path variants were implemented, measured, and DELETED as
# perf-neutral dead ends (docs/PERF.md "Adjudicated kernel knobs", r4):
# base-2 softmax with log2(e) prescaled into the bias slabs (KVQ_EXP2),
# probability row sums as a ones-column on the p@v matmul (KVQ_MXU_SUM),
# and bwd normalization folded onto the (N, hd) dout tile
# (KVQ_BWD_PNFOLD).  Repeated A/B runs flipped sign inside the tunnel
# noise band at every dominant geometry.
# Probability-space overflow clamp for the fold softmax:
# p = min(exp(s), _CLAMP_P).  An EXACT power of two, so the bwd kernel's
# saturation detection (pn == _CLAMP_P * rinv, i.e. "not <") is a
# bitwise-identical product on every backend — the r4 scheme clamped the
# exp *argument* at 60 and detected p == exp(60), which required the
# in-kernel vectorized exp and the trace-time constant-folded exp to
# agree bit-for-bit; on the TPU backend they differ by ~5.7e-6, so that
# zeroing never engaged (caught by tests/test_train_block.py's
# fold-clamp test).  exp overflow is still guarded: exp(s) = inf for
# s > ~88.7 and min(inf, _CLAMP_P) = _CLAMP_P.  Only engages on
# pathological logit scales (post-LN qk logits are O(10)).
_CLAMP_P = 2.0 ** 70
_FOLD_CLAMP = math.log(_CLAMP_P)  # s-space threshold (goldens/tests)

# GELU's erf in the EVAL block kernel.  "poly": odd minimax polynomial
# erf(z) ~ clip(z * P(min(z^2, 9)), -1, 1), deg-10 in z^2 — max |erf| error
# 2.2e-5 (GELU abs error <= 4.7e-5, invisible at bf16 resolution and far
# under the 2e-4 kernel-vs-XLA test tolerance) with ZERO transcendentals;
# "erfexp": Abramowitz-Stegun 7.1.26 (an exp + a reciprocal per element on
# the VPU transcendental path).
GELU_MODE = os.environ.get("KVQ_GELU", "poly")

# erf(z) = z * P(z^2) power coefficients, Chebyshev-fit on |z| <= 3
# (tools/ fit: f32 Horner max err 1.39e-5 in-range, clamp err 2.2e-5).
_ERF_POLY = (
    1.128378771e+00, -3.761148710e-01, 1.127822544e-01, -2.676044652e-02,
    5.119686234e-03, -7.936017384e-04, 9.740944341e-05, -9.001324840e-06,
    5.787369846e-07, -2.274933852e-08, 4.074324995e-10,
)


def _erf_poly(z):
    """Transcendental-free erf for the block kernel's exact GELU."""
    u = jnp.minimum(z * z, 9.0)
    acc = jnp.float32(_ERF_POLY[-1])
    for c in _ERF_POLY[-2::-1]:
        acc = acc * u + jnp.float32(c)
    return jnp.clip(z * acc, -1.0, 1.0)


def _plan_bias_cache(geo: WindowGeometry):
    """Decide the pattern-bias caching strategy for the fused block kernel.

    The fragment gate and the h/w-axis seam mask depend only on the
    window's (h_idx, w_idx) *pattern* — never on the batch or the d-axis
    position (the d fragment count is 1, and the d seam reduces to one
    extra additive mask on last-d windows).  So the gate-blended bias only
    takes P = Hw*Ww distinct values; reconstructing it per *window
    instance* (B*Dw*P of them) — as the r1 kernel did — wastes
    VPU time that measured 4.6 ms/block at stage 0 (B=4, T=96).

    Returns (p_eff, mode, pb):
      p_eff  -- number of distinct bias patterns (1 when the bias is
                pattern-independent: unfragmented and h/w-unshifted)
      mode   -- 'resident': all p_eff patterns cached in VMEM scratch,
                1-D grid over window chunks (also the no-cache case)
                'major': 2-D grid (P/pb, B*Dw) with the pattern-chunk as
                the SLOW axis — each pb-pattern cache slab is filled once
                and reused across the whole batch*depth sweep
      pb     -- cache slab depth (patterns held in VMEM at once)
    """
    _, Hw, Ww = geo.wgrid
    P = Hw * Ww
    sd, sh, sw = geo.shift
    n = geo.n_tokens
    p_eff = P if (geo.use_frag or sh or sw) else 1
    # one (h, N, N) bias slab in the configured cache dtype
    bpp = geo.num_heads * n * n * jnp.dtype(BIAS_CACHE_DTYPE).itemsize
    budget = BIAS_CACHE_BUDGET
    if p_eff * bpp <= budget:
        return p_eff, "resident", p_eff
    for g in (8, 4, 2, 1):
        if p_eff % g == 0 and g * bpp <= budget:
            return p_eff, "major", g
    return p_eff, "major", 1


def _make_block_kernel(geo: WindowGeometry, scale: float, group: int,
                       C: int, hidden: int, mode: str, p_eff: int,
                       pb: int, eps: float = 1e-6,
                       droppath: bool = False):
    """One grid step = `group` windows through the ENTIRE Swin block:
    LN1 -> qkv -> per-head attention -> proj -> +residual -> LN2 ->
    MLP(GELU) -> +residual.

    All weights are VMEM-resident; the (BW, N, C) token tensor makes one
    HBM round trip per block instead of ~10 (LN/qkv/transpose/attn/proj/
    MLP materializations) — stage 0/1 of Swin-T are bandwidth-bound, so
    this is where the eval time lives.

    Bias handling (see :func:`_plan_bias_cache`): the gate-blended
    rel/frag bias with the h/w seam folded in is built ONCE per pattern
    into a persistent VMEM scratch cache and re-read by every window
    instance of that pattern; the d-axis seam is one extra
    ``dflag * maskd`` FMA on last-d windows only.  Softmax normalization
    is deferred past the p@v matmul ((N, hd) divides instead of (N, N)).

    Measured dead end (r2): a merged-window variant that batched the
    per-token matmuls (LN/qkv/proj/MLP) across the whole ``group`` as one
    (G*N, C) matmul — on the theory that ~(4+3h) small per-window matmuls
    leave the MXU latency-bound — was NOT faster (swin-tiny trunk
    4x96x224x224: 14.1 ms merged vs 13.8 ms this kernel; stage3
    regressed 0.3 -> 1.4 ms).  Mosaic already pipelines the per-window
    matmuls well at these sizes; the fori_loop form keeps VMEM smaller.

    Second measured dead end (r2): interleaving TWO independent windows
    per fori_loop step (issuing each LN/qkv/attn/proj/MLP phase for both
    back-to-back, so the scheduler could overlap one window's MXU phase
    with the other's VPU phase) was perf-neutral at the dominant config
    (C=96 frag+shift: 7.53 ms vs 7.5-8.0 baseline) and one ablation
    variant's Mosaic compile hung >15 min — the single-window chain is
    already overlap-scheduled across fori_loop iterations."""
    Dp, Hp, Wp = geo.dims
    wd, wh, ww = geo.window
    sd, sh, sw = geo.shift
    fd, fh, fw = geo.fragments
    Dw, Hw, Ww = geo.wgrid
    P = Hw * Ww
    use_frag = geo.use_frag
    h = geo.num_heads
    hd = geo.head_dim
    hw_shifted = bool(sh or sw)
    d_seam = bool(sd)
    need_cache = use_frag or hw_shifted
    _check_frag_grid(geo)

    def kernel(x_ref, n1s_ref, n1b_ref, qkvw_ref, qkvb_ref,
               projw_ref, projb_ref, n2s_ref, n2b_ref,
               fc1w_ref, fc1b_ref, fc2w_ref, fc2b_ref,
               relb_ref, *rest):
        rest = list(rest)
        fragb_ref = rest.pop(0) if use_frag else None
        maskd_ref = rest.pop(0) if d_seam else None
        dp1_ref = rest.pop(0) if droppath else None
        dp2_ref = rest.pop(0) if droppath else None
        out_ref = rest.pop(0)
        cache_ref = rest.pop(0) if need_cache else None

        if mode == "major":
            pc = pl.program_id(0)
            bd = pl.program_id(1)
            dlast = jax.lax.rem(bd, Dw) == Dw - 1
            # x-tile block index (mirrors _block_grid_plan's tile_map)
            block_idx = bd * pl.num_programs(0) + pc
        else:
            chunk = pl.program_id(0)
            block_idx = chunk

        def build_bias(slot, pat):
            """Blend rel/frag by the fragment gate and fold the h/w seam
            for window pattern ``pat`` into cache slab ``slot``."""
            gate, seam = _pattern_gate_seam(geo, pat)
            for hh in range(h):
                b = _blend_bias(
                    geo, gate, seam, relb_ref[hh],
                    fragb_ref[hh] if use_frag else None,
                )
                if BLOCK_SOFTMAX == "fold":
                    # per-row constants cancel in softmax; folding the
                    # slab's row max here removes the per-instance (N, N)
                    # row-max pass from the hot loop
                    b = b - jnp.max(b, axis=-1, keepdims=True)
                cache_ref[slot, hh] = b.astype(cache_ref.dtype)

        if need_cache:
            if mode == "major":
                first = pl.program_id(1) == 0

                def fill(i, _):
                    build_bias(i, pc * pb + i)
                    return 0
            else:
                first = pl.program_id(0) == 0

                def fill(i, _):
                    build_bias(i, i)
                    return 0

            @pl.when(first)
            def _():
                jax.lax.fori_loop(0, pb, fill, 0)

        def ln(xx, s_ref, b_ref):
            # flax LayerNorm's exact formulation: var = mean(x^2) - mean(x)^2
            xf = xx.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
            var = jnp.maximum(0.0, mu2 - mu * mu)
            y = (xf - mu) * jax.lax.rsqrt(var + eps)
            return y * s_ref[0].astype(jnp.float32) + b_ref[0].astype(
                jnp.float32
            )

        def body(g, _):
            if mode == "major":
                slot = g  # chunk = pb consecutive patterns at one (b, d)
                dflag = dlast
            else:
                w = chunk * group + g
                slot = jax.lax.rem(w, P) if p_eff > 1 else 0
                dflag = jax.lax.rem(w // P, Dw) == Dw - 1
            if d_seam:
                dmul = jnp.where(dflag, jnp.float32(1.0), jnp.float32(0.0))

            xw = x_ref[g]  # (N, C)
            y = ln(xw, n1s_ref, n1b_ref).astype(xw.dtype)
            qkv = (
                jax.lax.dot_general(
                    y, qkvw_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + qkvb_ref[0].astype(jnp.float32)
            ).astype(xw.dtype)  # (N, 3C)

            outs = []
            for hh in range(h):
                # scale folded into the (N, hd) q tile — one fewer VPU pass
                # over the (N, N) scores than `dot(q, k) * scale`
                q = (qkv[:, hh * hd : (hh + 1) * hd].astype(jnp.float32)
                     * scale).astype(xw.dtype)
                k = qkv[:, C + hh * hd : C + (hh + 1) * hd]
                v = qkv[:, 2 * C + hh * hd : 2 * C + (hh + 1) * hd]
                s = jax.lax.dot_general(
                    q, k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if need_cache:
                    s = s + cache_ref[slot, hh].astype(jnp.float32)
                else:
                    s = s + relb_ref[hh]
                if d_seam:
                    s = s + dmul * maskd_ref[...]
                if BLOCK_SOFTMAX == "fold":
                    # bias row max folded into the slab (or pre-folded
                    # relb on the no-cache path): bias-add + exp is ONE
                    # pass, no row-max reduction.  The p-space min guards
                    # f32 exp overflow (see _CLAMP_P).
                    p = jnp.minimum(jnp.exp(s), _CLAMP_P).astype(
                        xw.dtype
                    )
                else:
                    m = jnp.max(s, axis=-1, keepdims=True)
                    # exp in the input dtype: max-folded arguments peak
                    # near 0 where the bf16 cast costs nothing; p feeds
                    # the AV matmul as ``v.dtype`` anyway
                    p = jnp.exp((s - m).astype(xw.dtype))
                # deferred normalization: divide the (N, hd) p@v result
                # instead of the (N, N) probabilities.  The 1e-37 floor
                # guards the fold path against a whole row underflowing
                # (all args < -87 flush to 0 on TPU -> inf -> NaN); free
                # on the (N, 1) sums, inert whenever any arg > -69
                r = 1.0 / jnp.maximum(
                    jnp.sum(
                        p.astype(jnp.float32), axis=-1, keepdims=True
                    ),
                    1e-37,
                )
                outs.append(
                    (jax.lax.dot_general(
                        p, v,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * r).astype(xw.dtype)
                )
            att = jnp.concatenate(outs, axis=-1)  # (N, C)
            att = (
                jax.lax.dot_general(
                    att, projw_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + projb_ref[0].astype(jnp.float32)
            ).astype(xw.dtype)
            if droppath:
                att = (
                    att.astype(jnp.float32)
                    * dp1_ref[block_idx * group + g, 0]
                ).astype(xw.dtype)
            x1 = xw + att

            y2 = ln(x1, n2s_ref, n2b_ref).astype(xw.dtype)
            hmid = (
                jax.lax.dot_general(
                    y2, fc1w_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + fc1b_ref[0].astype(jnp.float32)
            )
            # exact-GELU via polynomial erf (Mosaic lowers neither erf nor
            # erfc); see GELU_MODE — default is the transcendental-free
            # minimax poly, "erfexp" keeps Abramowitz-Stegun 7.1.26
            # (max abs error 1.5e-7, but an exp + a reciprocal/element)
            z = hmid * (2.0 ** -0.5)
            if GELU_MODE == "poly":
                erf_z = _erf_poly(z)
            else:
                sgn = jnp.sign(z)
                az = jnp.abs(z)
                t = 1.0 / (1.0 + 0.3275911 * az)
                poly = (
                    ((((1.061405429 * t - 1.453152027) * t) + 1.421413741)
                     * t - 0.284496736) * t + 0.254829592
                ) * t
                erf_z = sgn * (1.0 - poly * jnp.exp(-az * az))
            hmid = (0.5 * hmid * (1.0 + erf_z)).astype(xw.dtype)
            mlp = (
                jax.lax.dot_general(
                    hmid, fc2w_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + fc2b_ref[0].astype(jnp.float32)
            ).astype(xw.dtype)
            if droppath:
                mlp = (
                    mlp.astype(jnp.float32)
                    * dp2_ref[block_idx * group + g, 0]
                ).astype(xw.dtype)
            out_ref[g] = x1 + mlp
            return 0

        jax.lax.fori_loop(0, group, body, 0)

    return kernel


def fused_swin_block(
    x,
    params: dict,
    rel_bias,
    frag_bias,
    geo: WindowGeometry,
    scale: float | None = None,
    interpret: bool = False,
    dp1=None,
    dp2=None,
):
    """x: (BW, N, C) partitioned+rolled tokens; params holds the block's
    weights (norm1/qkv/proj/norm2/fc1/fc2 with flax names); rel/frag bias
    (h, N, N) fp32.  Returns (BW, N, C) — the full block output.

    dp1/dp2: optional (BW, 1) f32 DropPath multipliers (mask/keep, per
    window) applied to the attention / MLP residual branches — the train
    forward path passes these; eval passes None.

    VMEM feasibility is the caller's contract (SwinBlock3D gates on an
    estimate of planes + weights + tiles <= 80 MB against the kernel's
    100 MB compiler ceiling); all four Swin-T stages, 3-24 heads, with or
    without fragment bias, take this path at KSVQE eval shapes."""
    interpret = interpret or EVAL_INTERPRET
    BW, N, C = x.shape
    h, hd = geo.num_heads, geo.head_dim
    assert h * hd == C and N == geo.n_tokens
    if scale is None:
        scale = hd ** -0.5
    assert (frag_bias is not None) == geo.use_frag

    hidden = params["fc1_w"].shape[1]
    Dw, Hw, Ww = geo.wgrid
    P = Hw * Ww
    sd = geo.shift[0]
    d_seam = bool(sd)
    p_eff, mode, pb = _plan_bias_cache(geo)
    need_cache = geo.use_frag or bool(geo.shift[1] or geo.shift[2])
    if BLOCK_SOFTMAX == "fold" and not need_cache:
        # no-cache blocks read the rel plane directly — fold its row max
        # here (tiny (h, N, N) XLA op) so the kernel's fused add+exp path
        # holds on every block; cached blocks fold at slab build instead
        rel_bias = rel_bias - jnp.max(rel_bias, axis=-1, keepdims=True)

    # pattern-major 2-D grid ('major'): the slow axis walks pattern
    # chunks, the fast axis the B*Dw window instances of those patterns —
    # each bias-cache slab is filled once and reused across the whole
    # sweep.  'resident': 1-D window-chunk grid, all patterns cached.
    (G, grid, tile_map, const_map, full_map,
     mode2, p_eff2, pb2) = _block_grid_plan(geo, BW, x.dtype.itemsize, N, C)
    assert (mode2, p_eff2, pb2) == (mode, p_eff, pb)

    droppath = dp1 is not None
    assert (dp2 is not None) == droppath
    kernel = _make_block_kernel(
        geo, float(scale), G, C, hidden, mode, p_eff, pb,
        droppath=droppath,
    )

    def vec(p):  # (C,) -> (1, C) so Mosaic gets a 2-D block
        return p.reshape(1, -1)

    spec_x = pl.BlockSpec((G, N, C), tile_map, memory_space=pltpu.VMEM)

    def mat_spec(a):
        return pl.BlockSpec(a.shape, const_map, memory_space=pltpu.VMEM)

    def bias_spec(a):
        return pl.BlockSpec(a.shape, full_map, memory_space=pltpu.VMEM)

    args = [
        x,
        vec(params["norm1_scale"]), vec(params["norm1_bias"]),
        params["qkv_w"], vec(params["qkv_b"]),
        params["proj_w"], vec(params["proj_b"]),
        vec(params["norm2_scale"]), vec(params["norm2_bias"]),
        params["fc1_w"], vec(params["fc1_b"]),
        params["fc2_w"], vec(params["fc2_b"]),
        rel_bias,
    ]
    in_specs = [spec_x] + [mat_spec(a) for a in args[1:13]] + [
        bias_spec(rel_bias)
    ]
    if geo.use_frag:
        args.append(frag_bias)
        in_specs.append(bias_spec(frag_bias))
    if d_seam:
        dsm = _d_seam_mask(geo)
        args.append(dsm)
        in_specs.append(mat_spec(args[-1]))
    if droppath:
        # full-array blocks (always tiling-legal); kernel indexes globally
        dp_spec = pl.BlockSpec(
            dp1.shape, (lambda *a: (0, 0)), memory_space=pltpu.VMEM
        )
        args += [dp1, dp2]
        in_specs += [dp_spec, dp_spec]
    n_planes = 1 + int(geo.use_frag)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=(
            [pltpu.VMEM((pb, h, N, N), BIAS_CACHE_DTYPE)]
            if need_cache else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * BW * N * (3 * C * C + 2 * N * hd * h + C * C
                                + 2 * C * hidden),
            bytes_accessed=2 * BW * N * C * x.dtype.itemsize
            + n_planes * h * N * N * 4,
            transcendentals=BW * h * N * N + (
                0 if GELU_MODE == "poly" else BW * N * hidden
            ),
        ),
        # Raise Mosaic's scoped-VMEM ceiling (default 16 MB) so the fp32
        # bias cache of the wide stages (12/24 heads, with fragment bias)
        # stays VMEM-resident; v5e/v5p have 128 MB VMEM per core.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return out


@functools.lru_cache(maxsize=None)
def _d_seam_mask_np(dims, window, shift, n, whww):
    import numpy as np

    Dp, wd, sd = dims[0], window[0], shift[0]
    Dw = Dp // wd
    od = np.arange(n) // whww
    gd = (Dw - 1) * wd + od
    seg = np.where(gd < Dp - wd, 0, np.where(gd < Dp - sd, 1, 2))
    return np.where(
        seg[:, None] != seg[None, :], -100.0, 0.0
    ).astype(np.float32)


def _d_seam_mask(geo: WindowGeometry):
    """(N, N) additive seam mask of the d axis for LAST-d windows (the only
    windows whose d-axis seam is nontrivial; earlier windows have a uniform
    d segment).  Applied in-kernel as ``dflag * maskd`` — pairs already
    h/w-masked get -200 instead of -100, which is identical post-softmax
    (exp(-100) ~ 4e-44 is zero against unit-scale logits in fp32)."""
    wh, ww = geo.window[1], geo.window[2]
    return jnp.asarray(
        _d_seam_mask_np(
            geo.dims, geo.window, geo.shift, geo.n_tokens, wh * ww
        )
    )


# ---------------------------------------------------------------------------
# Backward-capable flash window attention (training path)
#
# The XLA training composition materializes the (B*nW, h, N, N) score and
# probability tensors to HBM in the forward AND (with remat, twice more in)
# the backward — at train shapes that is the single largest slice of the
# step (tools/profile_train_cuts.py: stages fwd+bwd 202 of 354 ms).  These
# kernels keep all (N, N) intermediates in VMEM.  The backward recomputes
# scores per window (flash style) instead of saving probabilities; taking
# both `out` and `do` as operands lets it form the row-dot term
# rowsum(do*out) in the natural (N, 1) orientation, avoiding any in-kernel
# transposes.  drel/dfrag are accumulated into revisited (1, N, N) output
# blocks that stay VMEM-resident for a whole head's sweep.
#
# Grid: (heads, pattern-chunks, B*Dw) with the window-instance axis
# fastest — the per-pattern blended bias (and gate, in the backward) is
# built once per (head, pattern-chunk) into VMEM scratch and reused by
# every window instance, exactly as in the fused eval block kernel.

# Tests force the CPU interpreter through this flag (plus monkeypatching
# is not needed: the flag is read at trace time).
TRAIN_INTERPRET = False

# Same, for the forward-only EVAL kernels (fused block, flash window
# attention, no-bias CDM flash): every entry reads
# ``interpret or EVAL_INTERPRET`` at trace time, so CPU-mesh tests can
# exercise the production shard_map + pallas_call composition
# (config/Kwai_KSVQE.yml ships use_pallas: true) without a TPU.
EVAL_INTERPRET = False

# Model modules route to these kernels only when the backend is TPU or
# this is set (nn/swin._pallas_backend_ok, nn/cdm) — CPU runs then MUST
# also set the *_INTERPRET flags above, or Mosaic lowering fails.
ALLOW_CPU_PALLAS = False


def _train_specs(geo: WindowGeometry, G: int, hd: int):
    """Common BlockSpecs for the train fwd/bwd kernels: q/k/v/out tiles,
    per-head bias planes, and the static d-seam mask."""
    _, Hw, Ww = geo.wgrid
    P = Hw * Ww
    N = geo.n_tokens

    def tile_map(hh, pc, bd):
        return (bd * (P // G) + pc, hh, 0, 0)

    def plane_map(hh, pc, bd):
        return (hh, 0, 0)

    def mask_map(hh, pc, bd):
        return (0, 0)

    tile = pl.BlockSpec((G, 1, N, hd), tile_map, memory_space=pltpu.VMEM)
    plane = pl.BlockSpec((1, N, N), plane_map, memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((N, N), mask_map, memory_space=pltpu.VMEM)
    return tile, plane, mask


def _pick_train_group(geo: WindowGeometry) -> int:
    _, Hw, Ww = geo.wgrid
    P = Hw * Ww
    n = geo.n_tokens
    budget = 24 * 1024 * 1024  # bias (+gate) cache slabs
    for g in (8, 4, 2, 1):
        if P % g == 0 and 2 * g * n * n * 4 <= budget:
            return g
    return 1


def _make_train_fwd_kernel(geo: WindowGeometry, scale: float, G: int):
    Dw = geo.wgrid[0]
    use_frag = geo.use_frag
    hw_shifted = bool(geo.shift[1] or geo.shift[2])
    d_seam = bool(geo.shift[0])
    need_cache = use_frag or hw_shifted
    _check_frag_grid(geo)

    def kernel(q_ref, k_ref, v_ref, relb_ref, *rest):
        rest = list(rest)
        fragb_ref = rest.pop(0) if use_frag else None
        maskd_ref = rest.pop(0) if d_seam else None
        out_ref = rest.pop(0)
        cache_ref = rest.pop(0) if need_cache else None
        pc = pl.program_id(1)
        bd = pl.program_id(2)

        if need_cache:
            @pl.when(bd == 0)
            def _():
                def fill(i, _):
                    gate, seam = _pattern_gate_seam(geo, pc * G + i)
                    cache_ref[i] = _blend_bias(
                        geo, gate, seam, relb_ref[0],
                        fragb_ref[0] if use_frag else None,
                    )
                    return 0

                jax.lax.fori_loop(0, G, fill, 0)

        if d_seam:
            dmul = jnp.where(
                jax.lax.rem(bd, Dw) == Dw - 1,
                jnp.float32(1.0), jnp.float32(0.0),
            )

        def body(g, _):
            q = q_ref[g, 0]
            k = k_ref[g, 0]
            v = v_ref[g, 0]
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + (cache_ref[g] if need_cache else relb_ref[0])
            if d_seam:
                s = s + dmul * maskd_ref[...]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * r
            out_ref[g, 0] = o.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, G, body, 0)

    return kernel


def _make_train_bwd_kernel(geo: WindowGeometry, scale: float, G: int):
    Dw = geo.wgrid[0]
    use_frag = geo.use_frag
    hw_shifted = bool(geo.shift[1] or geo.shift[2])
    d_seam = bool(geo.shift[0])
    need_cache = use_frag or hw_shifted
    _check_frag_grid(geo)

    def kernel(q_ref, k_ref, v_ref, relb_ref, *rest):
        rest = list(rest)
        fragb_ref = rest.pop(0) if use_frag else None
        maskd_ref = rest.pop(0) if d_seam else None
        out_ref = rest.pop(0)   # saved forward output
        do_ref = rest.pop(0)
        dq_ref = rest.pop(0)
        dk_ref = rest.pop(0)
        dv_ref = rest.pop(0)
        drel_ref = rest.pop(0)
        dfrag_ref = rest.pop(0) if use_frag else None
        cache_ref = rest.pop(0) if need_cache else None
        gate_ref = rest.pop(0) if use_frag else None
        pc = pl.program_id(1)
        bd = pl.program_id(2)

        if need_cache:
            @pl.when(bd == 0)
            def _():
                def fill(i, _):
                    gate, seam = _pattern_gate_seam(geo, pc * G + i)
                    if use_frag:
                        gate_ref[i] = gate
                    cache_ref[i] = _blend_bias(
                        geo, gate, seam, relb_ref[0],
                        fragb_ref[0] if use_frag else None,
                    )
                    return 0

                jax.lax.fori_loop(0, G, fill, 0)

        # zero the per-head table-gradient accumulators at the first visit
        @pl.when(jnp.logical_and(pc == 0, bd == 0))
        def _():
            drel_ref[0] = jnp.zeros_like(drel_ref[0])
            if use_frag:
                dfrag_ref[0] = jnp.zeros_like(dfrag_ref[0])

        if d_seam:
            dmul = jnp.where(
                jax.lax.rem(bd, Dw) == Dw - 1,
                jnp.float32(1.0), jnp.float32(0.0),
            )

        def body(g, _):
            q = q_ref[g, 0]
            k = k_ref[g, 0]
            v = v_ref[g, 0]
            o = out_ref[g, 0]
            do = do_ref[g, 0]
            # recompute normalized probabilities (flash style)
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + (cache_ref[g] if need_cache else relb_ref[0])
            if d_seam:
                s = s + dmul * maskd_ref[...]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            pn = p / jnp.sum(p, axis=-1, keepdims=True)  # (N, N) f32

            dof = do.astype(jnp.float32)
            dsum = jnp.sum(
                dof * o.astype(jnp.float32), axis=-1, keepdims=True
            )  # (N, 1) = rowsum(do * out)
            dp = jax.lax.dot_general(
                do, v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (N, N)
            ds = pn * (dp - dsum)  # (N, N) f32

            dsl = (ds * scale).astype(q.dtype)
            dq_ref[g, 0] = jax.lax.dot_general(
                dsl, k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dq_ref.dtype)
            dk_ref[g, 0] = jax.lax.dot_general(
                dsl, q,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dk_ref.dtype)
            dv_ref[g, 0] = jax.lax.dot_general(
                pn.astype(do.dtype), do,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)

            if use_frag:
                gate = gate_ref[g]
                drel_ref[0] += ds * gate
                dfrag_ref[0] += ds * (1.0 - gate)
            else:
                drel_ref[0] += ds
            return 0

        jax.lax.fori_loop(0, G, body, 0)

    return kernel


def _train_attention_fwd_impl(geo, scale, q, k, v, rel, frag):
    BW, h, N, hd = q.shape
    G = _pick_train_group(geo)
    Dw, Hw, Ww = geo.wgrid
    P = Hw * Ww
    need_cache = geo.use_frag or bool(geo.shift[1] or geo.shift[2])
    d_seam = bool(geo.shift[0])
    tile, plane, mask = _train_specs(geo, G, hd)
    grid = (h, P // G, BW // P)
    args = [q, k, v, rel]
    in_specs = [tile, tile, tile, plane]
    if geo.use_frag:
        args.append(frag)
        in_specs.append(plane)
    if d_seam:
        args.append(_d_seam_mask(geo))
        in_specs.append(mask)
    kernel = _make_train_fwd_kernel(geo, float(scale), G)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=(
            [pltpu.VMEM((G, N, N), jnp.float32)] if need_cache else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BW * h * N * N * hd,
            bytes_accessed=4 * BW * h * N * hd * q.dtype.itemsize
            + (1 + int(geo.use_frag)) * h * N * N * 4,
            transcendentals=BW * h * N * N,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=TRAIN_INTERPRET,
    )(*args)


def _train_attention_bwd_impl(geo, scale, q, k, v, rel, frag, out, do):
    BW, h, N, hd = q.shape
    G = _pick_train_group(geo)
    Dw, Hw, Ww = geo.wgrid
    P = Hw * Ww
    need_cache = geo.use_frag or bool(geo.shift[1] or geo.shift[2])
    d_seam = bool(geo.shift[0])
    tile, plane, mask = _train_specs(geo, G, hd)
    grid = (h, P // G, BW // P)
    args = [q, k, v, rel]
    in_specs = [tile, tile, tile, plane]
    if geo.use_frag:
        args.append(frag)
        in_specs.append(plane)
    if d_seam:
        args.append(_d_seam_mask(geo))
        in_specs.append(mask)
    args += [out, do]
    in_specs += [tile, tile]

    out_shapes = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),   # dq
        jax.ShapeDtypeStruct(q.shape, q.dtype),   # dk
        jax.ShapeDtypeStruct(q.shape, q.dtype),   # dv
        jax.ShapeDtypeStruct((h, N, N), jnp.float32),  # drel
    ]
    out_specs = [tile, tile, tile, plane]
    if geo.use_frag:
        out_shapes.append(jax.ShapeDtypeStruct((h, N, N), jnp.float32))
        out_specs.append(plane)

    scratch = []
    if need_cache:
        scratch.append(pltpu.VMEM((G, N, N), jnp.float32))
    if geo.use_frag:
        scratch.append(pltpu.VMEM((G, N, N), jnp.float32))

    kernel = _make_train_bwd_kernel(geo, float(scale), G)
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * BW * h * N * N * hd,
            bytes_accessed=8 * BW * h * N * hd * q.dtype.itemsize
            + 2 * (1 + int(geo.use_frag)) * h * N * N * 4,
            transcendentals=BW * h * N * N,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=TRAIN_INTERPRET,
    )(*args)
    if geo.use_frag:
        dq, dk, dv, drel, dfrag = res
        return dq, dk, dv, drel, dfrag
    dq, dk, dv, drel = res
    return dq, dk, dv, drel, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _wat_frag(geo, scale, q, k, v, rel, frag):
    return _train_attention_fwd_impl(geo, scale, q, k, v, rel, frag)


def _wat_frag_fwd(geo, scale, q, k, v, rel, frag):
    out = _train_attention_fwd_impl(geo, scale, q, k, v, rel, frag)
    return out, (q, k, v, rel, frag, out)


def _wat_frag_bwd(geo, scale, res, do):
    q, k, v, rel, frag, out = res
    dq, dk, dv, drel, dfrag = _train_attention_bwd_impl(
        geo, scale, q, k, v, rel, frag, out, do
    )
    return dq, dk, dv, drel, dfrag


_wat_frag.defvjp(_wat_frag_fwd, _wat_frag_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _wat_nofrag(geo, scale, q, k, v, rel):
    return _train_attention_fwd_impl(geo, scale, q, k, v, rel, None)


def _wat_nofrag_fwd(geo, scale, q, k, v, rel):
    out = _train_attention_fwd_impl(geo, scale, q, k, v, rel, None)
    return out, (q, k, v, rel, out)


def _wat_nofrag_bwd(geo, scale, res, do):
    q, k, v, rel, out = res
    dq, dk, dv, drel, _ = _train_attention_bwd_impl(
        geo, scale, q, k, v, rel, None, out, do
    )
    return dq, dk, dv, drel


_wat_nofrag.defvjp(_wat_nofrag_fwd, _wat_nofrag_bwd)


def window_attention_train(q, k, v, rel_bias, frag_bias,
                           geo: WindowGeometry, scale: float | None = None):
    """Differentiable flash window attention for the TRAINING path.

    q/k/v: (B*nW, h, N, hd); rel/frag bias (h, N, N) fp32 planes
    (pre-gathered from the tables — upstream autodiff scatters the plane
    gradients back into the tables).  Returns (B*nW, h, N, hd).

    Semantics match the XLA composition in WindowAttention3D (gate-blended
    dual bias + seam masks); gradients are custom (flash-style
    recomputation, see _make_train_bwd_kernel).  No attention dropout —
    callers gate on attn_drop == 0.
    """
    assert (frag_bias is not None) == geo.use_frag
    _, h, N, hd = q.shape
    if scale is None:
        scale = hd ** -0.5
    if geo.use_frag:
        return _wat_frag(geo, float(scale), q, k, v, rel_bias, frag_bias)
    return _wat_nofrag(geo, float(scale), q, k, v, rel_bias)


# ---------------------------------------------------------------------------
# Whole-block training kernel: fused fwd (the eval block kernel + DropPath)
# and a fused bwd that recomputes the forward per window and produces every
# gradient — dx, all weight/bias/LN grads, and the rel/frag table-plane
# grads — in ONE pallas_call.  The XLA train composition of the same block
# (LN/qkv/partition/attn-kernel/proj/LN/MLP + autodiff) measured 139 ms of
# the 201 ms B=4xT=32 KSVQE train step (tools/profile_train_cuts.py); this
# kernel exists to collapse that the same way fused_swin_block collapsed
# the eval trunk (204 -> ~50 ms at T=96).
#
# Weight-gradient accumulation uses the sequential-TPU-grid idiom already
# proven by _make_train_bwd_kernel's drel accumulation: output refs with a
# CONSTANT index map stay VMEM-resident across grid steps; the first step
# zeroes them, every step accumulates its windows, and the final writeback
# flushes the totals.  All accumulation is f32 regardless of compute dtype.


def _make_block_train_bwd_kernel(geo: WindowGeometry, scale: float,
                                 group: int, C: int, hidden: int,
                                 mode: str, p_eff: int, pb: int,
                                 eps: float = 1e-6):
    Dp, Hp, Wp = geo.dims
    Dw, Hw, Ww = geo.wgrid
    P = Hw * Ww
    use_frag = geo.use_frag
    hw_shifted = bool(geo.shift[1] or geo.shift[2])
    d_seam = bool(geo.shift[0])
    need_cache = use_frag or hw_shifted
    h = geo.num_heads
    hd = geo.head_dim
    _check_frag_grid(geo)
    inv_sqrt2 = 2.0 ** -0.5
    pdf_c = 0.5 * math.sqrt(2.0 / math.pi)

    def kernel(x_ref, n1s_ref, n1b_ref, qkvw_ref, qkvb_ref,
               projw_ref, projb_ref, n2s_ref, n2b_ref,
               fc1w_ref, fc1b_ref, fc2w_ref, fc2b_ref,
               relb_ref, *rest):
        rest = list(rest)
        fragb_ref = rest.pop(0) if use_frag else None
        maskd_ref = rest.pop(0) if d_seam else None
        dp1_ref = rest.pop(0)
        dp2_ref = rest.pop(0)
        do_ref = rest.pop(0)
        # outputs
        dx_ref = rest.pop(0)
        dn1s_ref = rest.pop(0)
        dn1b_ref = rest.pop(0)
        dqkvw_ref = rest.pop(0)
        dqkvb_ref = rest.pop(0)
        dprojw_ref = rest.pop(0)
        dprojb_ref = rest.pop(0)
        dn2s_ref = rest.pop(0)
        dn2b_ref = rest.pop(0)
        dfc1w_ref = rest.pop(0)
        dfc1b_ref = rest.pop(0)
        dfc2w_ref = rest.pop(0)
        dfc2b_ref = rest.pop(0)
        drel_ref = rest.pop(0)
        dfrag_ref = rest.pop(0) if use_frag else None
        # scratch
        cache_ref = rest.pop(0) if need_cache else None
        gcache_ref = rest.pop(0) if use_frag else None

        if mode == "major":
            pc = pl.program_id(0)
            bd = pl.program_id(1)
            dlast = jax.lax.rem(bd, Dw) == Dw - 1
            first = jnp.logical_and(pc == 0, bd == 0)
            cache_first = bd == 0
            # x-tile block index (mirrors _block_grid_plan's tile_map)
            block_idx = bd * pl.num_programs(0) + pc
        else:
            chunk = pl.program_id(0)
            first = chunk == 0
            cache_first = chunk == 0
            block_idx = chunk

        if need_cache:
            # per-head slabs: fill all heads of each pattern
            def fill_all(i, _):
                pat = (pc * pb + i) if mode == "major" else i
                gate, seam = _pattern_gate_seam(geo, pat)
                if use_frag:
                    gcache_ref[i] = gate
                for hh in range(h):
                    b = _blend_bias(
                        geo, gate, seam, relb_ref[hh],
                        fragb_ref[hh] if use_frag else None,
                    )
                    # fold the slab row max (cancels in softmax; keeps the
                    # recompute's fused add+exp in one pass, matching fwd)
                    b = b - jnp.max(b, axis=-1, keepdims=True)
                    cache_ref[i, hh] = b.astype(cache_ref.dtype)
                return 0

            @pl.when(cache_first)
            def _():
                jax.lax.fori_loop(0, pb, fill_all, 0)

        @pl.when(first)
        def _():
            dn1s_ref[...] = jnp.zeros_like(dn1s_ref)
            dn1b_ref[...] = jnp.zeros_like(dn1b_ref)
            dqkvw_ref[...] = jnp.zeros_like(dqkvw_ref)
            dqkvb_ref[...] = jnp.zeros_like(dqkvb_ref)
            dprojw_ref[...] = jnp.zeros_like(dprojw_ref)
            dprojb_ref[...] = jnp.zeros_like(dprojb_ref)
            dn2s_ref[...] = jnp.zeros_like(dn2s_ref)
            dn2b_ref[...] = jnp.zeros_like(dn2b_ref)
            dfc1w_ref[...] = jnp.zeros_like(dfc1w_ref)
            dfc1b_ref[...] = jnp.zeros_like(dfc1b_ref)
            dfc2w_ref[...] = jnp.zeros_like(dfc2w_ref)
            dfc2b_ref[...] = jnp.zeros_like(dfc2b_ref)
            drel_ref[...] = jnp.zeros_like(drel_ref)
            if use_frag:
                dfrag_ref[...] = jnp.zeros_like(dfrag_ref)

        def ln_fwd(xf, s_ref, b_ref):
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
            var = jnp.maximum(0.0, mu2 - mu * mu)
            r = jax.lax.rsqrt(var + eps)
            xhat = (xf - mu) * r
            y = xhat * s_ref[0].astype(jnp.float32) + b_ref[0].astype(
                jnp.float32
            )
            return y, xhat, r

        def ln_bwd(dy, xhat, r, s_ref):
            dxhat = dy * s_ref[0].astype(jnp.float32)
            m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
            m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
            return r * (dxhat - m1 - xhat * m2)

        def mm(a, b, dims):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(dims, ((), ())),
                preferred_element_type=jnp.float32,
            )

        def body(g, _):
            if mode == "major":
                slot = g
                dflag = dlast
            else:
                w = chunk * group + g
                slot = jax.lax.rem(w, P) if p_eff > 1 else 0
                dflag = jax.lax.rem(w // P, Dw) == Dw - 1
            if d_seam:
                dmul = jnp.where(dflag, jnp.float32(1.0), jnp.float32(0.0))

            xw = x_ref[g]
            dt = xw.dtype
            xf = xw.astype(jnp.float32)
            do = do_ref[g].astype(jnp.float32)
            dp1 = dp1_ref[block_idx * group + g, 0]
            dp2 = dp2_ref[block_idx * group + g, 0]

            # ---- forward recompute ----
            y1f, xhat1, r1 = ln_fwd(xf, n1s_ref, n1b_ref)
            y1 = y1f.astype(dt)
            qkv = (
                mm(y1, qkvw_ref[...], ((1,), (0,)))
                + qkvb_ref[0].astype(jnp.float32)
            ).astype(dt)

            heads = []
            for hh in range(h):
                qs = (qkv[:, hh * hd:(hh + 1) * hd].astype(jnp.float32)
                      * scale).astype(dt)
                k = qkv[:, C + hh * hd: C + (hh + 1) * hd]
                v = qkv[:, 2 * C + hh * hd: 2 * C + (hh + 1) * hd]
                s = mm(qs, k, ((1,), (1,)))
                if need_cache:
                    s = s + cache_ref[slot, hh].astype(jnp.float32)
                else:
                    s = s + relb_ref[hh]
                if d_seam:
                    s = s + dmul * maskd_ref[...]
                p = jnp.minimum(jnp.exp(s), _CLAMP_P)
                # same all-underflow guard as the fwd kernel's fold path
                rinv = 1.0 / jnp.maximum(
                    jnp.sum(p, axis=-1, keepdims=True), 1e-37
                )
                pnd = (p * rinv).astype(dt)  # normalized probs
                o_h = mm(pnd, v, ((1,), (0,)))  # (N, hd) f32
                # store UNnormalized p: the grad loop's saturation test
                # compares it against the literal _CLAMP_P (see below)
                heads.append((qs, k, v, p, pnd, rinv, o_h))

            att_cat = jnp.concatenate(
                [o.astype(dt) for *_x, o in heads], axis=-1
            )
            att = (
                mm(att_cat, projw_ref[...], ((1,), (0,)))
                + projb_ref[0].astype(jnp.float32)
            )
            x1 = xf + dp1 * att
            y2f, xhat2, r2 = ln_fwd(x1, n2s_ref, n2b_ref)
            y2 = y2f.astype(dt)
            h1 = (
                mm(y2, fc1w_ref[...], ((1,), (0,)))
                + fc1b_ref[0].astype(jnp.float32)
            )
            z = h1 * inv_sqrt2
            erf_z = _erf_poly(z)
            phi = 0.5 * (1.0 + erf_z)
            g1 = h1 * phi
            g1d = g1.astype(dt)

            # ---- backward ----
            dm2 = do * dp2  # (N, C)
            dm2d = dm2.astype(dt)
            dfc2w_ref[...] += mm(g1d, dm2d, ((0,), (0,)))
            dfc2b_ref[...] += jnp.sum(dm2, axis=0, keepdims=True)
            dg1 = mm(dm2d, fc2w_ref[...], ((1,), (1,)))  # (N, hidden)
            dh1 = dg1 * (phi + h1 * pdf_c * jnp.exp(-z * z))
            dh1d = dh1.astype(dt)
            dfc1w_ref[...] += mm(y2, dh1d, ((0,), (0,)))
            dfc1b_ref[...] += jnp.sum(dh1, axis=0, keepdims=True)
            dy2 = mm(dh1d, fc1w_ref[...], ((1,), (1,)))  # (N, C)
            dn2s_ref[...] += jnp.sum(dy2 * xhat2, axis=0, keepdims=True)
            dn2b_ref[...] += jnp.sum(dy2, axis=0, keepdims=True)
            dx1 = do + ln_bwd(dy2, xhat2, r2, n2s_ref)

            datt = dx1 * dp1
            dattd = datt.astype(dt)
            dprojw_ref[...] += mm(att_cat, dattd, ((0,), (0,)))
            dprojb_ref[...] += jnp.sum(datt, axis=0, keepdims=True)
            dao = mm(dattd, projw_ref[...], ((1,), (1,)))  # (N, C)

            dqs, dks, dvs = [], [], []
            for hh in range(h):
                qs, k, v, p, pnd, rinv, o_h = heads[hh]
                dao_h = dao[:, hh * hd:(hh + 1) * hd]
                dao_d = dao_h.astype(dt)
                dsum = jnp.sum(dao_h * o_h, axis=-1, keepdims=True)
                dvs.append(mm(pnd, dao_d, ((0,), (0,))).astype(dt))
                dpn = mm(dao_d, v, ((1,), (1,)))  # (N, N) f32
                # d/ds min(exp(s), K) is 0 on saturated entries, detected
                # as the STORED p equalling the LITERAL _CLAMP_P — no
                # arithmetic in the comparison, so no rounding/precision
                # subtlety can flip it.  The r4 scheme compared pn
                # against exp(C)*rinv and was dead code on TPU (the
                # constant-folded exp differs from the VPU exp by
                # ~5.7e-6); an intermediate pn-vs-_CLAMP_P*rinv form
                # relied on the two products rounding identically, which
                # --xla_allow_excess_precision does not guarantee.
                # Verified on the real chip by
                # tools/check_kernels_on_chip.py (saturated-logit case).
                # Costs no extra VMEM (p replaces pn in the tuple; an
                # s-derived mask blew the stage-2 bwd kernel's stack).
                ds = jnp.where(p < _CLAMP_P, (p * rinv) * (dpn - dsum),
                               0.0)
                if use_frag:
                    gate = gcache_ref[slot]
                    drel_ref[hh] += ds * gate
                    dfrag_ref[hh] += ds * (1.0 - gate)
                else:
                    drel_ref[hh] += ds
                dsd = ds.astype(dt)
                dqs.append(
                    (mm(dsd, k, ((1,), (0,))) * scale).astype(dt)
                )
                dks.append(mm(dsd, qs, ((0,), (0,))).astype(dt))

            dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # (N,3C) dt
            dqkv_f = dqkv.astype(jnp.float32)
            dqkvw_ref[...] += mm(y1, dqkv, ((0,), (0,)))
            dqkvb_ref[...] += jnp.sum(dqkv_f, axis=0, keepdims=True)
            dy1 = mm(dqkv, qkvw_ref[...], ((1,), (1,)))  # (N, C)
            dn1s_ref[...] += jnp.sum(dy1 * xhat1, axis=0, keepdims=True)
            dn1b_ref[...] += jnp.sum(dy1, axis=0, keepdims=True)
            dx = dx1 + ln_bwd(dy1, xhat1, r1, n1s_ref)
            dx_ref[g] = dx.astype(dx_ref.dtype)
            return 0

        jax.lax.fori_loop(0, group, body, 0)

    return kernel


def _block_grid_plan(geo: WindowGeometry, BW: int, itemsize: int,
                     N: int, C: int, max_pb: int | None = None):
    """Shared grid/index-map planning for the fused block kernels (eval
    fwd, train fwd, train bwd) — one source of truth so the three calls
    cannot drift apart.  max_pb caps the bias-cache slab depth (the bwd
    kernel shrinks it to make room for its gradient accumulators — wide
    stages would otherwise blow the VMEM ceiling)."""
    Dw, Hw, Ww = geo.wgrid
    P = Hw * Ww
    p_eff, mode, pb = _plan_bias_cache(geo)
    if max_pb is not None and p_eff > 1 and pb > max_pb:
        assert P % max_pb == 0
        mode, pb = "major", max_pb

    if mode == "major":
        G = pb
        grid = (P // pb, BW // P)

        def tile_map(pc, bd):
            return (bd * (P // pb) + pc, 0, 0)

        def const_map(pc, bd):
            return (0, 0)

        def full_map(pc, bd):
            return (0, 0, 0)
    else:
        budget = 4 * 1024 * 1024
        per_window = 2 * N * C * itemsize
        G = 1
        for g in (8, 4, 2, 1):
            if BW % g == 0 and g * per_window <= budget:
                G = g
                break
        grid = (BW // G,)

        def tile_map(chunk):
            return (chunk, 0, 0)

        def const_map(chunk):
            return (0, 0)

        def full_map(chunk):
            return (0, 0, 0)

    return G, grid, tile_map, const_map, full_map, mode, p_eff, pb


def _train_bwd_vmem_at(geo: WindowGeometry, C: int, hidden: int,
                       pb: int) -> int:
    N = geo.n_tokens
    h = geo.num_heads
    use_frag = geo.use_frag
    need_cache = use_frag or bool(geo.shift[1] or geo.shift[2])
    n_planes = 1 + int(use_frag)
    est = 0
    if need_cache:
        est += pb * h * N * N * 4           # bias cache
    if use_frag:
        est += pb * N * N * 4               # gate cache
    est += 2 * n_planes * h * N * N * 4     # relb/fragb in + drel/dfrag out
    wbytes = (3 * C * C + C * C + 2 * C * hidden)
    est += wbytes * 2                       # weights (bf16)
    est += wbytes * 4                       # f32 grad accumulators
    est += 10 * N * N * 4                   # live score/prob/grad planes
    est += 4 * N * 3 * C * 4                # qkv/dqkv planes
    est += 3 * 8 * N * C * 2                # x/dx/do tiles (G<=8)
    est += 2 * 1024 * 1024                  # slack
    return est


def _train_bwd_pb(geo: WindowGeometry, C: int, hidden: int):
    """Bias-cache slab depth for the train BWD kernel: start from the
    shared plan and halve until the gradient accumulators + cache fit the
    80 MB gate (the bwd carries ~wbytes*6 + 2x bias-plane IO the eval
    kernel doesn't)."""
    Dw, Hw, Ww = geo.wgrid
    P = Hw * Ww
    p_eff, _, pb = _plan_bias_cache(geo)
    if p_eff <= 1:
        return None, _train_bwd_vmem_at(geo, C, hidden, 0)
    while pb > 1 and _train_bwd_vmem_at(
        geo, C, hidden, pb
    ) > 80 * 1024 * 1024 and P % (pb // 2) == 0:
        pb //= 2
    return pb, _train_bwd_vmem_at(geo, C, hidden, pb)


def train_block_vmem_bytes(geo: WindowGeometry, C: int, hidden: int) -> int:
    """VMEM footprint of the train-block BWD kernel (the larger of the
    two) at the slab depth it will actually use — SwinBlock3D gates the
    fused train path on this the same way the eval path gates on its own
    estimate."""
    return _train_bwd_pb(geo, C, hidden)[1]


def _block_train_bwd_impl(geo, scale, interpret, x, params, rel, frag,
                          dp1, dp2, dout):
    BW, N, C = x.shape
    h = geo.num_heads
    hidden = params["fc1_w"].shape[1]
    need_cache = geo.use_frag or bool(geo.shift[1] or geo.shift[2])
    d_seam = bool(geo.shift[0])
    rel_in = rel
    if not need_cache:
        # fold the rel plane's row max for the in-kernel p recompute
        # (per-row constants cancel in softmax; the TRUE function — and
        # therefore every gradient, drel included — is unchanged)
        rel_in = rel - jnp.max(rel, axis=-1, keepdims=True)
    frag_in = frag

    max_pb, _est = _train_bwd_pb(geo, C, hidden)
    (G, grid, tile_map, const_map, full_map,
     mode, p_eff, pb) = _block_grid_plan(
        geo, BW, x.dtype.itemsize, N, C, max_pb=max_pb
    )

    def vec(p):
        return p.reshape(1, -1)

    spec_x = pl.BlockSpec((G, N, C), tile_map, memory_space=pltpu.VMEM)
    dp_spec = pl.BlockSpec(
        dp1.shape, (lambda *a: (0, 0)), memory_space=pltpu.VMEM
    )

    def mat_spec(a):
        return pl.BlockSpec(a.shape, const_map, memory_space=pltpu.VMEM)

    def bias_spec(a):
        return pl.BlockSpec(a.shape, full_map, memory_space=pltpu.VMEM)

    args = [
        x,
        vec(params["norm1_scale"]), vec(params["norm1_bias"]),
        params["qkv_w"], vec(params["qkv_b"]),
        params["proj_w"], vec(params["proj_b"]),
        vec(params["norm2_scale"]), vec(params["norm2_bias"]),
        params["fc1_w"], vec(params["fc1_b"]),
        params["fc2_w"], vec(params["fc2_b"]),
        rel_in,
    ]
    in_specs = [spec_x] + [mat_spec(a) for a in args[1:13]] + [
        bias_spec(rel_in)
    ]
    if geo.use_frag:
        args.append(frag_in)
        in_specs.append(bias_spec(frag_in))
    if d_seam:
        dsm = _d_seam_mask(geo)
        args.append(dsm)
        in_specs.append(mat_spec(args[-1]))
    args += [dp1, dp2, dout]
    in_specs += [dp_spec, dp_spec, spec_x]

    f32 = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),          # dx
        jax.ShapeDtypeStruct((1, C), f32),               # dn1s
        jax.ShapeDtypeStruct((1, C), f32),               # dn1b
        jax.ShapeDtypeStruct((C, 3 * C), f32),           # dqkvw
        jax.ShapeDtypeStruct((1, 3 * C), f32),           # dqkvb
        jax.ShapeDtypeStruct((C, C), f32),               # dprojw
        jax.ShapeDtypeStruct((1, C), f32),               # dprojb
        jax.ShapeDtypeStruct((1, C), f32),               # dn2s
        jax.ShapeDtypeStruct((1, C), f32),               # dn2b
        jax.ShapeDtypeStruct((C, hidden), f32),          # dfc1w
        jax.ShapeDtypeStruct((1, hidden), f32),          # dfc1b
        jax.ShapeDtypeStruct((hidden, C), f32),          # dfc2w
        jax.ShapeDtypeStruct((1, C), f32),               # dfc2b
        jax.ShapeDtypeStruct((h, N, N), f32),            # drel
    ]
    out_specs = [spec_x] + [
        mat_spec(s) for s in out_shapes[1:13]
    ] + [bias_spec(out_shapes[13])]
    if geo.use_frag:
        out_shapes.append(jax.ShapeDtypeStruct((h, N, N), f32))
        out_specs.append(bias_spec(out_shapes[-1]))

    scratch = []
    if need_cache:
        scratch.append(pltpu.VMEM((pb, h, N, N), f32))
    if geo.use_frag:
        scratch.append(pltpu.VMEM((pb, N, N), f32))

    kernel = _make_block_train_bwd_kernel(
        geo, float(scale), G, C, hidden, mode, p_eff, pb
    )
    n_planes = 1 + int(geo.use_frag)
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * BW * N * (3 * C * C + 2 * N * geo.head_dim * h
                                    + C * C + 2 * C * hidden),
            bytes_accessed=4 * BW * N * C * x.dtype.itemsize
            + 2 * n_planes * h * N * N * 4,
            transcendentals=2 * BW * h * N * N + BW * N * hidden,
        ),
        # 112 MB, not the 100 MB the other kernels use: the stage-2 bwd
        # stack measures ~102-107 MB depending on the surrounding graph
        # (v5e VMEM is 128 MB; Mosaic still rejects unplaceable stacks)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)

    (dx, dn1s, dn1b, dqkvw, dqkvb, dprojw, dprojb, dn2s, dn2b,
     dfc1w, dfc1b, dfc2w, dfc2b, drel) = res[:14]
    dfrag = res[14] if geo.use_frag else None

    def like(gr, p):
        return gr.reshape(p.shape).astype(p.dtype)

    dparams = {
        "norm1_scale": like(dn1s, params["norm1_scale"]),
        "norm1_bias": like(dn1b, params["norm1_bias"]),
        "qkv_w": like(dqkvw, params["qkv_w"]),
        "qkv_b": like(dqkvb, params["qkv_b"]),
        "proj_w": like(dprojw, params["proj_w"]),
        "proj_b": like(dprojb, params["proj_b"]),
        "norm2_scale": like(dn2s, params["norm2_scale"]),
        "norm2_bias": like(dn2b, params["norm2_bias"]),
        "fc1_w": like(dfc1w, params["fc1_w"]),
        "fc1_b": like(dfc1b, params["fc1_b"]),
        "fc2_w": like(dfc2w, params["fc2_w"]),
        "fc2_b": like(dfc2b, params["fc2_b"]),
    }
    drel = drel.astype(rel.dtype)
    if geo.use_frag:
        dfrag = dfrag.astype(frag.dtype)
    return dx, dparams, drel, dfrag


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _tsb_frag(geo, scale, interpret, x, params, rel, frag, dp1, dp2):
    return fused_swin_block(
        x, params, rel, frag, geo, scale=scale, interpret=interpret,
        dp1=dp1, dp2=dp2,
    )


def _tsb_frag_fwd(geo, scale, interpret, x, params, rel, frag, dp1, dp2):
    out = _tsb_frag(geo, scale, interpret, x, params, rel, frag, dp1, dp2)
    return out, (x, params, rel, frag, dp1, dp2)


def _tsb_frag_bwd(geo, scale, interpret, res, dout):
    x, params, rel, frag, dp1, dp2 = res
    dx, dparams, drel, dfrag = _block_train_bwd_impl(
        geo, scale, interpret, x, params, rel, frag, dp1, dp2, dout
    )
    return dx, dparams, drel, dfrag, jnp.zeros_like(dp1), jnp.zeros_like(dp2)


_tsb_frag.defvjp(_tsb_frag_fwd, _tsb_frag_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _tsb_nofrag(geo, scale, interpret, x, params, rel, dp1, dp2):
    return fused_swin_block(
        x, params, rel, None, geo, scale=scale, interpret=interpret,
        dp1=dp1, dp2=dp2,
    )


def _tsb_nofrag_fwd(geo, scale, interpret, x, params, rel, dp1, dp2):
    out = _tsb_nofrag(geo, scale, interpret, x, params, rel, dp1, dp2)
    return out, (x, params, rel, dp1, dp2)


def _tsb_nofrag_bwd(geo, scale, interpret, res, dout):
    x, params, rel, dp1, dp2 = res
    dx, dparams, drel, _ = _block_train_bwd_impl(
        geo, scale, interpret, x, params, rel, None, dp1, dp2, dout
    )
    return dx, dparams, drel, jnp.zeros_like(dp1), jnp.zeros_like(dp2)


_tsb_nofrag.defvjp(_tsb_nofrag_fwd, _tsb_nofrag_bwd)


def train_swin_block(x, params, rel_bias, frag_bias, geo: WindowGeometry,
                     dp1, dp2, scale: float | None = None,
                     interpret: bool = False):
    """Differentiable fused whole-Swin-block for the TRAINING path.

    Forward = :func:`fused_swin_block` (LN1 -> qkv -> windowed attention
    with dual bias -> proj -> DropPath residual -> LN2 -> MLP -> DropPath
    residual); backward = one Pallas kernel that recomputes the forward
    per window (flash-style, nothing but the inputs is saved) and emits
    dx plus every weight/LN/bias-table gradient, accumulated in f32
    across the sequential TPU grid.

    x: (BW, N, C) partitioned+rolled tokens; dp1/dp2: (BW, 1) f32
    DropPath multipliers (mask/keep per window; pass ones when the rate
    is 0).  Semantics match the XLA train composition in SwinBlock3D
    (reference swin_backbone.py:245-326); no attention/proj dropout —
    callers gate on those being 0.
    """
    BW, N, C = x.shape
    if scale is None:
        scale = geo.head_dim ** -0.5
    assert (frag_bias is not None) == geo.use_frag
    assert dp1 is not None and dp2 is not None
    # Honor the module-level CPU-interpreter override (tests flip it to
    # run the Mosaic kernels off-TPU), same as window_attention_train.
    interpret = interpret or TRAIN_INTERPRET
    if geo.use_frag:
        return _tsb_frag(
            geo, float(scale), interpret, x, params, rel_bias, frag_bias,
            dp1, dp2,
        )
    return _tsb_nofrag(
        geo, float(scale), interpret, x, params, rel_bias, dp1, dp2,
    )
