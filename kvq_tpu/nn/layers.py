"""Common flax building blocks, channels-last / TPU-native.

Counterparts of the reference's torch modules (cited per class); all
modules compute in ``dtype`` (bfloat16 by default via model configs) with
float32 parameters, and normalizations accumulate in float32.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class Mlp(nn.Module):
    """2-layer MLP with GELU (reference swin_backbone.py:64-91)."""

    hidden_features: int
    out_features: int | None = None
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth — per-sample residual drop (timm DropPath used at
    reference swin_backbone.py:397)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over the trailing axis, float32 accumulation."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


class _PatchProj(nn.Module):
    """k=stride Conv3d expressed as space-to-depth + matmul.

    Parameter-compatible with ``nn.Conv`` (kernel (pt,ph,pw,Cin,F), bias
    (F,)) so checkpoint importers are unaffected.  XLA lowers a strided
    3-channel Conv3d to an im2col pipeline that runs ~20x slower than this
    single MXU matmul at KSVQE shapes (measured 18 ms -> <1 ms for the
    (2,4,4) embed of a (4,96,224,224,3) clip)."""

    patch_size: tuple[int, int, int]
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, packed: bool = False, in_channels: int = 3):
        # x: (B, T, H, W, C) with dims divisible by patch_size, or —
        # when ``packed`` — the s2d-packed (B, T/pt, H/ph, W/pw,
        # pt*ph*pw*in_channels) form (data/fragments.py:s2d_pack)
        pt, ph, pw = self.patch_size
        C = in_channels if packed else x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (pt, ph, pw, C, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if packed:
            assert x.shape[-1] == pt * ph * pw * C, x.shape
            w = kernel.reshape(pt * ph * pw * C, self.features).astype(
                self.dtype
            )
            return x.astype(self.dtype) @ w + bias.astype(self.dtype)
        B, T, H, W, C = x.shape
        x = x.reshape(B, T // pt, pt, H // ph, ph, W // pw, pw, C)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(B, T // pt, H // ph, W // pw, pt * ph * pw * C)
        # NOTE: the remaining cost here is the C=3-minor-dim relayout (the
        # 8-D transpose), which XLA executes at ~10 GB/s regardless of
        # formulation; it is still ~5 ms faster than the strided Conv3d
        # lowering.  Alternatives measured (tools/profile_patch_embed.py):
        # multi-contracting dot_general is slower (15 ms); pt*ph
        # strided-slice K=pw*C matmuls are 2x faster standalone (6 ms) but
        # the x[:, ti::pt, hi::ph] lowering FAULTS the TPU worker inside
        # the full KSVQE program, and the equivalent statically-indexed
        # view form is slower end-to-end (25.3 vs 23.1 ms/step).  A fused
        # Pallas patchify+matmul+LN kernel (r2) was rejected by Mosaic
        # ("infer-vector-layout: unsupported shape cast" — the lane-dim
        # split Wo*pw*C -> (Wo, pw*C) has no supported vector relayout),
        # and standalone XLA variants (8-slice einsum, conv) all bottom
        # out at the same ~10 GB/s relayout.  Keep the transpose.
        w = kernel.reshape(pt * ph * pw * C, self.features).astype(self.dtype)
        return x.astype(self.dtype) @ w + bias.astype(self.dtype)


class PatchEmbed3D(nn.Module):
    """Video-to-patch embedding: Conv3d k=stride=patch_size
    (reference swin_backbone.py:690-733), computed as space-to-depth +
    matmul.  Input (B, T, H, W, C)."""

    patch_size: tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    use_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, packed: bool = False):
        pt, ph, pw = self.patch_size
        if packed:
            # x is already space-to-depth packed (data/fragments.py
            # s2d_pack): (B, T/pt, H/ph, W/pw, pt*ph*pw*C) in the kernel's
            # (ti, hi, wi, c) flatten order — the embed is one plain
            # matmul, skipping the C=3-minor relayout entirely.
            x = _PatchProj(
                patch_size=self.patch_size,
                features=self.embed_dim,
                dtype=self.dtype,
                name="proj",
            )(x, packed=True)
            if self.use_norm:
                x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
            return x
        _, T, H, W, _ = x.shape
        pads = [(0, 0)]
        for dim, p in ((T, pt), (H, ph), (W, pw)):
            pads.append((0, (p - dim % p) % p))
        pads.append((0, 0))
        if any(p != (0, 0) for p in pads):
            x = jnp.pad(x, pads)
        x = _PatchProj(
            patch_size=self.patch_size,
            features=self.embed_dim,
            dtype=self.dtype,
            name="proj",
        )(x)
        if self.use_norm:
            x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x  # (B, T', H', W', embed_dim)


class PatchMerging(nn.Module):
    """2x2 spatial merge + linear 4C->2C (reference swin_backbone.py:519-555).
    Input (B, T, H, W, C)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, :, 0::2, 0::2]
        x1 = x[:, :, 1::2, 0::2]
        x2 = x[:, :, 0::2, 1::2]
        x3 = x[:, :, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)
        return x


def avg_std_pool(x, axes: Sequence[int], eps: float = 1e-10):
    """Concatenated global average + standard-deviation pooling.

    The reference taps ResNet stages with AdaptiveAvgPool2d + a global std
    pool (simpleVQA_model.py:8-11, 240-252).  torch.std uses the unbiased
    (n-1) estimator — matched here.  A tiny eps keeps the sqrt gradient
    finite for dead (all-zero) channels — torch.std has an infinite
    gradient there; the value difference is ~1e-5 absolute, far below the
    feature scale (documented divergence).
    """
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=axes)
    n = 1
    for a in axes:
        n *= x.shape[a]
    var = xf.var(axis=axes) * (n / max(n - 1, 1))
    return mean, jnp.sqrt(var + eps)


def trunc_normal_init(std: float = 0.02) -> Callable:
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)
