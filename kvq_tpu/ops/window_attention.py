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

Forward-only: the training path uses the XLA composition (same math,
autodiff'd); this kernel accelerates inference/benchmark.  Numerical
equivalence with the XLA path is covered by tests/test_window_attention.py.
"""

from __future__ import annotations

import dataclasses
import functools
import math

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

