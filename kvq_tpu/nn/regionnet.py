"""Quality-aware Region Selection (QRS) — RegionNet over CLIP cls-attention.

Reference: RegionNet_CLIP (patchnet.py:394-550).  Semantics:

  - per keyframe, the CLIP cls-attention map (sqrt(L) x sqrt(L)) is
    nearest-resized to the fragment anchor grid (gh x gw = 9 x 9 for the
    KVQ config);
  - candidate regions are every sqrt(k) x sqrt(k) (=7x7) anchor window at
    stride 1 -> (gh-6)*(gw-6) = 9 regions; region score = mean of its
    anchors' scores, min-max normalized;
  - train: perturbed top-1 soft indicator over regions (custom vjp);
    eval: hard argmax indicator;
  - the keyframe's choice broadcasts to its frame group (group_id);
  - output video = per-frame 224x224 region.

TPU redesign: the reference materializes an unfold of all 9 candidate
regions (b*t, 9, C*32*32*49) and bmm's with the indicator
(patchnet.py:487-492,532-535).  Here the selected region is a *weighted sum
of 9 statically-shifted slices* of the fragment mosaic — no 9x feature
buffer, one fused multiply-add chain under XLA, identical math for soft
(train) and one-hot (eval) weights.
"""

from __future__ import annotations

import math

import flax.linen as _fnn
import jax
import jax.numpy as jnp

from ..ops.topk import hard_topk_indicator, min_max_norm, perturbed_topk


def region_scores(cls_attn, grid_hw: tuple[int, int], k_side: int, stride: int = 1):
    """(B, L) cls-attention -> (B, n_regions) min-max-normalized scores."""
    b, L = cls_attn.shape
    s = int(math.isqrt(L))
    score = cls_attn.reshape(b, s, s)
    gh, gw = grid_hw
    if (s, s) != (gh, gw):
        # nearest resize with torch index semantics: src = floor(dst*in/out)
        # (reference F.interpolate mode="nearest", patchnet.py:476-478;
        # jax.image.resize 'nearest' uses half-pixel centers and picks
        # different source rows, e.g. 14->9 row 1 maps to 2 instead of 1)
        rows = (jnp.arange(gh) * s) // gh
        cols = (jnp.arange(gw) * s) // gw
        score = score[:, rows][:, :, cols]
    nh, nw = gh - k_side + 1, gw - k_side + 1
    # region means: sum over each k_side x k_side window via cumulative
    # windows — nh*nw is tiny (9), unroll statically
    means = []
    for i in range(0, nh, stride):
        for j in range(0, nw, stride):
            means.append(
                score[:, i : i + k_side, j : j + k_side].mean(axis=(1, 2))
            )
    scores = jnp.stack(means, axis=1)  # (b, n_regions)
    return min_max_norm(scores)


def extract_region_weighted(fragment, weights, anchor: int, k_side: int):
    """Weighted sum of candidate regions.

    fragment: (B, T, H, W, C) mosaic (H = W = gh*anchor);
    weights:  (B, T, n_regions) — soft indicator (train) or one-hot (eval);
    returns   (B, T, k_side*anchor, k_side*anchor, C).
    """
    B, T, H, W, C = fragment.shape
    gh, gw = H // anchor, W // anchor
    nh, nw = gh - k_side + 1, gw - k_side + 1
    out_side = k_side * anchor
    out = jnp.zeros((B, T, out_side, out_side, C), fragment.dtype)
    r = 0
    for i in range(nh):
        for j in range(nw):
            w = weights[:, :, r][..., None, None, None].astype(fragment.dtype)
            region = jax.lax.dynamic_slice(
                fragment,
                (0, 0, i * anchor, j * anchor, 0),
                (B, T, out_side, out_side, C),
            )
            out = out + w * region
            r += 1
    return out


def extract_region_hard(fragment, region_idx, anchor: int, k_side: int):
    """Eval-path region extraction: one dynamic-slice gather per frame.

    Numerically identical to :func:`extract_region_weighted` with a one-hot
    weight, but reads only the selected 224x224 region instead of
    accumulating a weighted sum over all nh*nw candidate slices (~9x less
    HBM traffic at KSVQE eval shapes).

    fragment: (B, T, H, W, C); region_idx: (B, T) int in [0, nh*nw).
    """
    B, T, H, W, C = fragment.shape
    gh = H // anchor
    nw = gh - k_side + 1
    out_side = k_side * anchor
    ys = (region_idx // nw) * anchor  # (B, T)
    xs = (region_idx % nw) * anchor

    def slice_one(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (out_side, out_side, C))

    fn = jax.vmap(jax.vmap(slice_one))
    return fn(fragment, ys, xs)


def keyframe_schedule(t: int, n_key: int = 4) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Static keyframe indices and per-frame group ids
    (reference obtain_keyframes, KSVQE_model.py:1352-1376: keyframes at
    0, t/4-1, t/2-1, 3t/4-1; group id increments at each threshold)."""
    thresholds = (t // 4 - 1, t // 2 - 1, t * 3 // 4 - 1)
    keyframes = (0,) + thresholds
    group = []
    gid = 0
    for j in range(t):
        if j in thresholds:
            gid += 1
        group.append(gid)
    return keyframes, tuple(group)


class RegionSelector:
    """Functional QRS: selects one 224x224 region per frame.

    Not an nn.Module — it has no parameters; randomness (perturbed top-k)
    comes in via an explicit key.
    """

    def __init__(
        self,
        k: int = 49,
        anchor_size: int = 32,
        stride: int = 1,
        num_samples: int = 500,
        sample_type: str = "topkpertubation",
        sigma: float = 0.5,
    ):
        self.k_side = int(math.isqrt(k))
        self.anchor = anchor_size
        self.stride = stride
        self.num_samples = num_samples
        self.sample_type = sample_type
        self.sigma = sigma

    def __call__(self, fragment, cls_attn, group_id, *, train: bool, key=None):
        """fragment (B,T,H,W,C); cls_attn (B, n_key, L);
        group_id: tuple of length T (static)."""
        B, T = fragment.shape[0], fragment.shape[1]
        grid_hw = (
            fragment.shape[2] // self.anchor,
            fragment.shape[3] // self.anchor,
        )
        sel = self.select(cls_attn, group_id, grid_hw, train=train, key=key)
        if not train:
            return extract_region_hard(
                fragment, sel, self.anchor, self.k_side
            )
        return extract_region_weighted(
            fragment, sel, self.anchor, self.k_side
        )

    def select(self, cls_attn, group_id, grid_hw, *, train: bool, key=None):
        """Region choice only (no extraction): per-frame soft weights
        (B, T, nR) when training, hard indices (B, T) at eval.  Split out
        so the s2d-packed input path (nn/ksvqe.py) can apply the same
        choice to each temporal-pair half independently — keyframe-group
        boundaries fall at odd frame indices (keyframe_schedule), so the
        two frames of a packed pair can belong to different groups."""
        b_nk, L = cls_attn.shape[0] * cls_attn.shape[1], cls_attn.shape[2]
        B, n_key = cls_attn.shape[0], cls_attn.shape[1]
        scores = region_scores(
            cls_attn.reshape(b_nk, L), grid_hw, self.k_side, self.stride
        )  # (B*n_key, nR)

        if train and self.sample_type == "topkpertubation":
            assert key is not None
            ind = perturbed_topk(
                scores, key, 1, self.num_samples, self.sigma
            )  # (B*n_key, 1, nR)
        elif train and self.sample_type == "gumbel":
            from ..ops.topk import gumbel_topk_indicator

            ind = gumbel_topk_indicator(scores, key)
        elif train and self.sample_type == "multinomial":
            # Reference get_multinomial_indicator (patchnet.py:411-418) is
            # broken as shipped (undefined `w_fre1`/`self.args`); the evident
            # intent — torch.multinomial, i.e. P(region) ∝ score — needs
            # log-scores as categorical logits (raw [0,1] min-max scores
            # would cap the best/worst probability ratio at e).
            assert key is not None
            idx = jax.random.categorical(
                key, jnp.log(scores + 1e-12), axis=-1
            )  # (B*n_key,)
            ind = jax.nn.one_hot(idx, scores.shape[-1], dtype=scores.dtype)[
                :, None, :
            ]
        elif train and self.sample_type == "random":
            assert key is not None
            nR = scores.shape[-1]
            idx = jax.random.randint(key, (b_nk,), 0, nR)
            ind = jax.nn.one_hot(idx, nR, dtype=scores.dtype)[:, None, :]
        else:
            # eval: hard top-1 -> a real gather, not a one-hot weighted sum
            gid = jnp.asarray(group_id, jnp.int32)  # (T,)
            key_idx = jnp.argmax(scores, axis=-1).reshape(B, n_key)
            return key_idx[:, gid]  # (B, T)

        nR = ind.shape[-1]
        key_weights = ind.reshape(B, n_key, nR)
        gid = jnp.asarray(group_id, jnp.int32)  # (T,)
        return key_weights[:, gid]  # (B, T, nR)


class PredictorLG(_fnn.Module):
    """Score-prediction MLP of the legacy PatchNet family (reference
    patchnet.py:9-33, unused by KSVQE — rebuilt for surface parity):
    LN -> Linear -> GELU, split channels into a local half and a
    globally-averaged half, then Linear -> GELU to one score per token."""

    dtype: object = jnp.float32

    @_fnn.compact
    def __call__(self, x):
        dt = self.dtype
        B, N, C = x.shape
        y = _fnn.LayerNorm(dtype=dt, name="in_norm")(x)
        y = _fnn.Dense(C, dtype=dt, name="in_fc")(y)
        y = _fnn.gelu(y)
        local = y[:, :, : C // 2]
        glob = jnp.broadcast_to(
            y[:, :, C // 2 :].mean(axis=1, keepdims=True), local.shape
        )
        y = jnp.concatenate([local, glob], axis=-1)
        y = _fnn.Dense(1, dtype=dt, name="out_fc")(y)
        return _fnn.gelu(y)


class PredictorLGConv(_fnn.Module):
    """Convolutional score net of the legacy PatchNet_ms_conv (reference
    patchnet.py:35-58, unused by KSVQE — rebuilt for surface parity):
    Conv3x3(C->2) -> GELU -> Conv3x3(2->2) -> GELU -> softmax over the two
    score channels.  Channels-last (N, H, W, C) -> (N, H, W, 2)."""

    dtype: object = jnp.float32

    @_fnn.compact
    def __call__(self, x):
        dt = self.dtype
        y = _fnn.Conv(2, (3, 3), padding=1, dtype=dt, name="conv1")(x)
        y = _fnn.gelu(y)
        y = _fnn.Conv(2, (3, 3), padding=1, dtype=dt, name="conv2")(y)
        y = _fnn.gelu(y)
        # reference nn.Softmax() (no dim) resolves to the channel dim on 4-D
        # input; channels-last here -> last axis
        return _fnn.softmax(y, axis=-1)


class PatchNetMSConv(_fnn.Module):
    """Legacy conv multi-scale PatchNet (reference PatchNet_ms_conv,
    patchnet.py:283-365, unused by KSVQE — rebuilt for surface parity).

    The functional mode (reference ``spatch``): the input stacks two scale
    variants along channels; a conv score net emits two per-pixel weights
    (softmaxed) that blend the scales.  The reference's ``time`` branch is
    broken as shipped (feeds 3-D input to Conv2d, returns an undefined
    name); it is not reproduced.

    Channels-last: (B, T, H, W, 2C) -> (B, T, H, W, C).
    """

    k: int = 49
    num_samples: int = 500
    dtype: object = jnp.float32

    @_fnn.compact
    def __call__(self, x, *, train: bool = False):
        B, T, H, W, C2 = x.shape
        assert C2 % 2 == 0, "input must stack two scales along channels"
        flat = x.reshape(B * T, H, W, C2)
        scores = PredictorLGConv(dtype=self.dtype, name="score_network")(flat)
        s1, s2 = flat[..., : C2 // 2], flat[..., C2 // 2 :]
        out = scores[..., 0:1] * s1 + scores[..., 1:2] * s2
        return out.reshape(B, T, H, W, C2 // 2)


class PatchNetMS(_fnn.Module):
    """Legacy multi-scale PatchNet (reference PatchNet_ms,
    patchnet.py:166-281, unused by KSVQE — rebuilt for surface parity).

    Two modes, both scored by a learned :class:`PredictorLG` net instead of
    CLIP attention:

      - ``mode='time'`` (reference ``score='tpool'``): score each frame from
        avg+max-pooled tokens, select ``k`` frames;
      - ``mode='spatial'`` (reference ``score='spatch'``): score anchor-size
        patches per frame, select one patch per frame.

    Train: perturbed top-k indicator (soft, differentiable); eval: hard
    top-k gather.  Channels-last (B, T, H, W, C) in/out.
    """

    k: int
    anchor_size: int = 7
    stride: int | None = None
    num_samples: int = 500
    sigma: float = 0.05
    mode: str = "time"
    dtype: object = jnp.float32

    @_fnn.compact
    def __call__(self, x, *, train: bool = False, key=None):
        from ..ops.topk import min_max_norm, perturbed_topk

        B, T, H, W, C = x.shape
        if self.mode == "time":
            tok = x.reshape(B, T, H * W, C)
            pooled = jnp.concatenate(
                [tok.mean(axis=2), tok.max(axis=2)], axis=-1
            )  # (B, T, 2C)
            scores = PredictorLG(dtype=self.dtype, name="score_network")(
                pooled
            )[..., 0]
            scores = min_max_norm(scores)  # (B, T)
            flat = x.reshape(B, T, H * W * C)
            if train:
                assert key is not None
                ind = perturbed_topk(
                    scores, key, self.k, self.num_samples, self.sigma
                )  # (B, k, T)
                sel = jnp.einsum("bkt,btd->bkd", ind.astype(flat.dtype), flat)
            else:
                _, idx = jax.lax.top_k(scores, self.k)
                idx = jnp.sort(idx, axis=-1)
                sel = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
            return sel.reshape(B, self.k, H, W, C)

        # spatial mode: one anchor_size x anchor_size patch per frame
        a = self.anchor_size
        s = self.stride or max((W - a) // 2, 1)
        tok = x.reshape(B * T, H * W, C)
        sc = PredictorLG(dtype=self.dtype, name="score_network")(tok)
        sc = sc.reshape(B * T, H, W, 1)

        def patchify(img):  # (N, H, W, c) -> (N, nP, a*a*c)
            p = jax.lax.conv_general_dilated_patches(
                img, (a, a), (s, s), "VALID",
                dimension_numbers=("NHWC", "OIHW", "NHWC"),
            )
            n, oh, ow, d = p.shape
            return p.reshape(n, oh * ow, d)

        score_patches = patchify(sc).mean(axis=-1)  # (BT, nP)
        scores = min_max_norm(score_patches)
        patches = patchify(x.reshape(B * T, H, W, C))  # (BT, nP, c*a*a)
        if train:
            assert key is not None
            ind = perturbed_topk(
                scores, key, 1, self.num_samples, self.sigma
            )  # (BT, 1, nP)
            sel = jnp.einsum(
                "bkp,bpd->bkd", ind.astype(patches.dtype), patches
            )[:, 0]
        else:
            idx = jnp.argmax(scores, axis=-1)
            sel = jnp.take_along_axis(
                patches, idx[:, None, None], axis=1
            )[:, 0]
        # conv_general_dilated_patches emits channel-major (c, a, a) features
        return (
            sel.reshape(B, T, C, a, a).transpose(0, 1, 3, 4, 2)
        )
