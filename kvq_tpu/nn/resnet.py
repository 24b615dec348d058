"""ResNet (v1) in flax, channels-last NHWC.

Capability parity with the reference's vendored torchvision ResNet
(simpleVQA_model.py:129-459) and the CONTRIQUE/CLIP ResNet encoders:

  - :class:`ResNet` with Bottleneck/Basic blocks, BatchNorm running stats;
  - :class:`FeatureResNet` — the SimpleVQA variant that returns per-frame
    concatenated avg+std pooled features of stages 2/3/4
    (simpleVQA_model.py:240-262) instead of logits;
  - weight import from torchvision state_dicts via
    :mod:`kvq_tpu.core.torch_import` (keys mapped, OIHW->HWIO transposed).

TPU notes: convs map to XLA's NHWC conv (MXU); BatchNorm statistics use
float32; under data parallelism batch stats are synchronized with
``lax.pmean`` when an axis_name is provided (SyncBatchNorm parity,
reference trainer_ddp.py:92).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import avg_std_pool


class BottleneckBlock(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                axis_name=self.bn_axis_name if train else None,
                name=name,
            )

        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = bn("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = bn("bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)
        if self.downsample:
            residual = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                axis_name=self.bn_axis_name if train else None,
                name=name,
            )

        residual = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = bn("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = bn("bn2")(y)
        if self.downsample:
            residual = nn.Conv(
                self.planes, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


_BLOCKS = {"basic": (BasicBlock, 1), "bottleneck": (BottleneckBlock, 4)}


class ResNetStem(nn.Module):
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None, name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x


class ResNetTrunk(nn.Module):
    """Stem + 4 stages; returns the per-stage feature maps."""

    layers: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        block_cls, expansion = _BLOCKS[self.block]
        x = ResNetStem(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                       name="stem")(x, train=train)
        feats = []
        inplanes = 64
        for stage, n_blocks in enumerate(self.layers):
            planes = 64 * (2**stage)
            strides = 1 if stage == 0 else 2
            for b in range(n_blocks):
                ds = b == 0 and (strides != 1 or inplanes != planes * expansion)
                x = block_cls(
                    planes=planes,
                    strides=strides if b == 0 else 1,
                    downsample=ds,
                    dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{stage + 1}_{b}",
                )(x, train=train)
                inplanes = planes * expansion
            feats.append(x)
        return feats


class FeatureResNet(nn.Module):
    """SimpleVQA spatial branch: per-frame avg+std pooled stage-2/3/4
    features concatenated with precomputed SlowFast motion features.

    Input batch dict: ``simpleVQA`` (B, T, H, W, 3) and ``feat`` (B, T, 2304).
    Output: (B, T, 7168 + 2304) feature tensor — the head applies the
    regression (reference simpleVQA_model.py:240-262: the in-model quality
    head is built but bypassed).
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, batch: dict[str, Any], *, train: bool = False):
        x = batch["simpleVQA"]
        feat3d = batch["feat"]
        B, T, H, W, C = x.shape
        x = x.reshape(B * T, H, W, C).astype(self.dtype)
        feats = ResNetTrunk(
            layers=self.layers, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name, name="trunk",
        )(x, train=train)
        pooled = []
        for f in feats[1:]:  # stages 2, 3, 4 (reference taps after layer2/3/4)
            mean, std = avg_std_pool(f, (1, 2))
            pooled.extend([mean, std])
        y = jnp.concatenate(pooled, axis=-1)  # (B*T, 7168) float32
        y = y.reshape(B, T, -1)
        return jnp.concatenate([y, feat3d.astype(y.dtype)], axis=-1)
