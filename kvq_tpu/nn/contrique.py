"""CONTRIQUE distortion tool — frozen ResNet-50 + MLP projector over a grid
of 32x32 patches per frame (reference CONTRIQUE_model,
KSVQE_model.py:1622-1665).

Per frame: split into (H/32)x(W/32) patches, encode each with the ResNet-50
trunk (global 1x1 output at 32x32 input), L2-normalize, project
2048 -> 2048 -> 128 with (frozen, running-stats) BatchNorm between.
Output: (B, T, G, 128) distortion tokens.

The whole module runs in eval semantics inside the training step (BN uses
running averages; it is frozen, reference KSVQE_model.py:1085-1086) —
``train`` is therefore not threaded in.

TPU note: all B*T*G patches are encoded as ONE batched conv pass — the
patchification is a reshape, not a loop.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .resnet import ResNetTrunk


class CONTRIQUE(nn.Module):
    anchor_size: int = 32
    projection_dim: int = 128
    layers: tuple[int, ...] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T, H, W, C)
        B, T, H, W, C = x.shape
        a = self.anchor_size
        gh, gw = H // a, W // a
        g = gh * gw
        # (B,T,gh,a,gw,a,C) -> (B*T*G, a, a, C)
        patches = (
            x.reshape(B, T, gh, a, gw, a, C)
            .transpose(0, 1, 2, 4, 3, 5, 6)
            .reshape(B * T * g, a, a, C)
        ).astype(self.dtype)

        feats = ResNetTrunk(layers=self.layers, dtype=self.dtype, name="encoder")(
            patches, train=False
        )
        h = feats[-1].mean(axis=(1, 2)).astype(jnp.float32)  # (N, 2048)
        h = h / (jnp.linalg.norm(h, axis=1, keepdims=True) + 1e-12)

        def bn(name):
            return nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=1e-5, name=name
            )

        z = nn.Dense(2048, use_bias=False, name="projector_fc1")(h)
        z = bn("projector_bn1")(z)
        z = nn.relu(z)
        z = nn.Dense(self.projection_dim, use_bias=False, name="projector_fc2")(z)
        z = bn("projector_bn2")(z)
        return z.reshape(B, T, g, self.projection_dim)
