"""Regression heads (reference models/head.py).

All five reference heads are provided.  1x1x1 Conv3d heads become Dense
layers applied channels-last — identical math, MXU-friendly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.registry import HEADS


@HEADS.register("simpleVQAHead")
class SimpleVQAHead(nn.Module):
    """Linear(in,hidden) -> Linear(hidden,1), mean over frames
    (reference head.py:19-31; no activation between the two layers)."""

    hidden_channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # x: (B, T, in_channels)
        x = nn.Dense(self.hidden_channels, dtype=self.dtype, name="fc1")(x)
        x = nn.Dense(1, dtype=self.dtype, name="fc2")(x)
        return x.mean(axis=1)  # (B, 1)


@HEADS.register("VQAHead")
class VQAHead(nn.Module):
    """Dropout(.5) -> 1x1x1 conv (C->hidden) -> GELU -> Dropout -> conv
    (hidden->1), mean over (T,H,W) (reference head.py:42-68)."""

    hidden_channels: int = 64
    num_class: int = 1
    dropout_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # x: (B, T, H, W, C) channels-last
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        x = nn.Dense(self.hidden_channels, dtype=self.dtype, name="fc_hid")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        x = nn.Dense(self.num_class, dtype=self.dtype, name="fc_last")(x)
        if self.num_class > 1:
            x = nn.softmax(x, axis=-1)
        return x.mean(axis=(1, 2, 3))  # (B, num_class)


@HEADS.register("IQAHead")
class IQAHead(nn.Module):
    """Linear head over image features (reference head.py:143-173)."""

    hidden_channels: int = 64
    num_class: int = 1
    dropout_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        x = nn.Dense(self.hidden_channels, dtype=self.dtype, name="fc_hid")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        x = nn.Dense(self.num_class, dtype=self.dtype, name="fc_last")(x)
        if self.num_class > 1:
            x = nn.softmax(x, axis=-1)
        return x.mean(axis=(-3, -2, -1))  # reference head.py:172


@HEADS.register("VARHead")
class VARHead(nn.Module):
    """Action-recognition head: dropout -> global avg pool -> 1x1x1 conv
    (reference head.py:116-141)."""

    out_channels: int = 400
    dropout_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        x = x.mean(axis=(1, 2, 3), keepdims=True)  # (B,1,1,1,C)
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="fc")(x)
        return x.mean(axis=(1, 2, 3))


@HEADS.register("MaxVQAHead")
class MaxVQAHead(nn.Module):
    """Multi-attribute head with grouped last conv (reference head.py:72-113)."""

    hidden_channels_per_dim: int = 64
    out_dims: int = 1
    dropout_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        h = nn.Dense(
            self.hidden_channels_per_dim * self.out_dims,
            dtype=self.dtype,
            name="fc_hid",
        )(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout_ratio, deterministic=not train)(h)
        # grouped 1x1x1 conv: each output dim sees its own hidden slice
        B = h.shape[:-1]
        h = h.reshape(*B, self.out_dims, self.hidden_channels_per_dim)
        w = self.param(
            "fc_last_kernel",
            nn.initializers.lecun_normal(),
            (self.out_dims, self.hidden_channels_per_dim),
        )
        b = self.param("fc_last_bias", nn.initializers.zeros, (self.out_dims,))
        out = jnp.einsum("...gd,gd->...g", h, w.astype(h.dtype)) + b
        return out.mean(axis=(1, 2, 3))
