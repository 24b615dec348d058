"""ConvNeXt-3D backbone (the `conv_tiny` model key).

Reference: ConvNeXt3D (conv_backbone.py:347-434) — stem Conv3d (2,4,4),
three (1,2,2) downsample convs, Block3D = depthwise (k,7,7) conv ->
LayerNorm -> pointwise MLP (4x) -> layer scale, with temporal kernel sizes
cycling through ``inflate_strategy`` ('131': k=1,3,1,...).  GRN-equipped V2
blocks (BlockV23D, :231-260) are included for the V2 variants.

Channels-last (B, T, H, W, C); depthwise convs use feature_group_count —
XLA lowers these to efficient TPU depthwise convolutions.
Reads ``batch['asesthetic']`` [sic — the reference's key, conv_backbone.py:432].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import DropPath


class GRN(nn.Module):
    """Global response normalization (ConvNeXt-V2, conv_backbone.py:7-18)."""

    @nn.compact
    def __call__(self, x):
        # x: (..., H, W, C) — norm over spatial dims
        gamma = self.param("gamma", nn.initializers.zeros, (x.shape[-1],))
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        gx = jnp.sqrt(
            jnp.sum(x.astype(jnp.float32) ** 2, axis=(-4, -3, -2), keepdims=True)
            + 1e-12
        )
        nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
        return (gamma * (x * nx.astype(x.dtype)) + beta + x).astype(x.dtype)


class Block3D(nn.Module):
    inflate_len: int = 3
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    v2: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dim = x.shape[-1]
        k = self.inflate_len
        y = nn.Conv(
            dim,
            kernel_size=(k, 7, 7),
            padding=((k // 2, k // 2), (3, 3), (3, 3)),
            feature_group_count=dim,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        if self.v2:
            y = GRN(name="grn")(y)
        y = nn.Dense(dim, dtype=self.dtype, name="pwconv2")(y)
        if not self.v2 and self.layer_scale_init > 0:
            gamma = self.param(
                "gamma",
                lambda key, s: jnp.full(s, self.layer_scale_init, jnp.float32),
                (dim,),
            )
            y = gamma.astype(y.dtype) * y
        return x + DropPath(self.drop_path, name="drop_path")(y, train=train)


class ConvNeXt3D(nn.Module):
    depths: tuple[int, ...] = (3, 3, 9, 3)
    dims: tuple[int, ...] = (96, 192, 384, 768)
    inflate_strategy: str = "131"
    patch_t: int = 2  # temporal stem size (1 -> per-frame 2D ConvNeXt)
    drop_path_rate: float = 0.0
    v2: bool = False
    input_key: str = "asesthetic"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch, *, train: bool = False):
        x = batch[self.input_key] if isinstance(batch, dict) else batch
        x = x.astype(self.dtype)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        for i in range(len(self.depths)):
            if i == 0:
                x = nn.Conv(
                    self.dims[0],
                    kernel_size=(self.patch_t, 4, 4),
                    strides=(self.patch_t, 4, 4),
                    padding="VALID",
                    dtype=self.dtype,
                    name="stem_conv",
                )(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(
                    epsilon=1e-6, dtype=self.dtype, name=f"down_norm_{i}"
                )(x)
                x = nn.Conv(
                    self.dims[i],
                    kernel_size=(1, 2, 2),
                    strides=(1, 2, 2),
                    padding="VALID",
                    dtype=self.dtype,
                    name=f"down_conv_{i}",
                )(x)
            for j in range(self.depths[i]):
                x = Block3D(
                    inflate_len=int(
                        self.inflate_strategy[j % len(self.inflate_strategy)]
                    ),
                    drop_path=float(dpr[cur + j]),
                    v2=self.v2,
                    dtype=self.dtype,
                    name=f"stage{i}_block{j}",
                )(x, train=train)
            cur += self.depths[i]
        # spatial output path (the VQA head consumes the feature volume,
        # reference forward_features(..., return_spatial=True) :423-427)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)


def convnext_3d_tiny(**kw) -> ConvNeXt3D:
    return ConvNeXt3D(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), **kw)


def convnext_3d_small(**kw) -> ConvNeXt3D:
    return ConvNeXt3D(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768), **kw)


def convnextv2_3d_pico(**kw) -> ConvNeXt3D:
    return ConvNeXt3D(
        depths=(2, 2, 6, 2), dims=(64, 128, 256, 512), v2=True, **kw
    )


def convnextv2_3d_femto(**kw) -> ConvNeXt3D:
    return ConvNeXt3D(
        depths=(2, 2, 6, 2), dims=(48, 96, 192, 384), v2=True, **kw
    )


def convnextv2_3d_atto(**kw) -> ConvNeXt3D:
    return ConvNeXt3D(
        depths=(2, 2, 6, 2), dims=(40, 80, 160, 320), v2=True, **kw
    )


def convnextv2_3d_nano(**kw) -> ConvNeXt3D:
    return ConvNeXt3D(
        depths=(2, 2, 8, 2), dims=(80, 160, 320, 640), v2=True, **kw
    )


def convnextv2_3d_tiny(**kw) -> ConvNeXt3D:
    return ConvNeXt3D(
        depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), v2=True, **kw
    )


def convnextv2_3d_base(**kw) -> ConvNeXt3D:
    return ConvNeXt3D(
        depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024), v2=True, **kw
    )


def convnextv2_3d_large(**kw) -> ConvNeXt3D:
    return ConvNeXt3D(
        depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536), v2=True, **kw
    )


def convnextv2_3d_huge(**kw) -> ConvNeXt3D:
    return ConvNeXt3D(
        depths=(3, 3, 27, 3), dims=(352, 704, 1408, 2816), v2=True, **kw
    )


def convnext_3d_base(**kw) -> ConvNeXt3D:
    return ConvNeXt3D(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024), **kw)


def convnext_3d_large(**kw) -> ConvNeXt3D:
    return ConvNeXt3D(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536), **kw)


def convnext_3d_xlarge(**kw) -> ConvNeXt3D:
    return ConvNeXt3D(depths=(3, 3, 27, 3), dims=(256, 512, 1024, 2048), **kw)


class ConvNeXt2D(nn.Module):
    """Per-image ConvNeXt (reference 2D variants, conv_backbone.py:265-340,
    542-583): the 3D machinery with temporal patch/kernels of 1, which is
    mathematically the 2D network applied per frame.  Accepts (B, H, W, C)
    or (B, T, H, W, C)."""

    depths: tuple[int, ...] = (3, 3, 9, 3)
    dims: tuple[int, ...] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    v2: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        squeeze = x.ndim == 4
        if squeeze:
            x = x[:, None]
        y = ConvNeXt3D(
            depths=self.depths,
            dims=self.dims,
            inflate_strategy="1",
            patch_t=1,
            drop_path_rate=self.drop_path_rate,
            v2=self.v2,
            dtype=self.dtype,
            name="trunk",
        )(x, train=train)
        return y[:, 0] if squeeze else y


def convnext_tiny(**kw) -> ConvNeXt2D:
    return ConvNeXt2D(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), **kw)


def convnext_small(**kw) -> ConvNeXt2D:
    return ConvNeXt2D(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768), **kw)


def convnext_base(**kw) -> ConvNeXt2D:
    return ConvNeXt2D(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024), **kw)


def convnext_large(**kw) -> ConvNeXt2D:
    return ConvNeXt2D(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536), **kw)


def convnext_xlarge(**kw) -> ConvNeXt2D:
    return ConvNeXt2D(depths=(3, 3, 27, 3), dims=(256, 512, 1024, 2048), **kw)


def convnextv2_atto(**kw) -> ConvNeXt2D:
    return ConvNeXt2D(depths=(2, 2, 6, 2), dims=(40, 80, 160, 320), v2=True, **kw)


def convnextv2_femto(**kw) -> ConvNeXt2D:
    return ConvNeXt2D(depths=(2, 2, 6, 2), dims=(48, 96, 192, 384), v2=True, **kw)


def convnext_pico(**kw) -> ConvNeXt2D:
    return ConvNeXt2D(depths=(2, 2, 6, 2), dims=(64, 128, 256, 512), **kw)


def convnextv2_nano(**kw) -> ConvNeXt2D:
    return ConvNeXt2D(depths=(2, 2, 8, 2), dims=(80, 160, 320, 640), v2=True, **kw)


def convnextv2_tiny(**kw) -> ConvNeXt2D:
    return ConvNeXt2D(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), v2=True, **kw)


def convnextv2_base(**kw) -> ConvNeXt2D:
    return ConvNeXt2D(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024), v2=True, **kw)


def convnextv2_large(**kw) -> ConvNeXt2D:
    return ConvNeXt2D(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536), v2=True, **kw)


def convnextv2_huge(**kw) -> ConvNeXt2D:
    return ConvNeXt2D(depths=(3, 3, 27, 3), dims=(352, 704, 1408, 2816), v2=True, **kw)
