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
import jax
import jax.numpy as jnp

from .resnet import ResNetTrunk

_BN_EPS = 1e-5


def _fold(conv_p, bn_p, bn_s):
    """Fold a frozen BatchNorm into the preceding bias-less conv/dense.

    Running stats are fixed (the tool is frozen AND input-detached,
    reference KSVQE_model.py:1085-1086,1425), so
    ``bn(conv(x)) = conv(x)*a + b`` with ``a = scale/sqrt(var+eps)``,
    ``b = bias - mean*a`` — exact algebra, done in f32 on the (HWIO or
    IO) kernel whose last axis is the output channel."""
    a = bn_p["scale"] / jnp.sqrt(bn_s["var"] + _BN_EPS)
    return conv_p["kernel"] * a, bn_p["bias"] - bn_s["mean"] * a


def _conv(x, kernel, bias, strides=1, padding=0, dtype=jnp.float32):
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(strides, strides),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(y.dtype)


def _folded_trunk_final(params, stats, x, layers, dtype):
    """Final-stage output of ResNetTrunk (bottleneck) with every frozen
    BN folded into its conv — same variable tree as the module path
    (resnet.py:ResNetTrunk), ~1/3 the elementwise ops and no
    batch_stats loads in the hot graph."""
    k, b = _fold(params["stem"]["conv1"], params["stem"]["bn1"],
                 stats["stem"]["bn1"])
    x = nn.relu(_conv(x, k, b, strides=2, padding=3, dtype=dtype))
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    inplanes = 64
    for stage, n_blocks in enumerate(layers):
        planes = 64 * (2 ** stage)
        strides = 1 if stage == 0 else 2
        for blk in range(n_blocks):
            name = f"layer{stage + 1}_{blk}"
            bp, bs = params[name], stats[name]
            s = strides if blk == 0 else 1
            ds = blk == 0 and (s != 1 or inplanes != planes * 4)
            residual = x
            k, b0 = _fold(bp["conv1"], bp["bn1"], bs["bn1"])
            y = nn.relu(_conv(x, k, b0, dtype=dtype))
            k, b0 = _fold(bp["conv2"], bp["bn2"], bs["bn2"])
            y = nn.relu(_conv(y, k, b0, strides=s, padding=1, dtype=dtype))
            k, b0 = _fold(bp["conv3"], bp["bn3"], bs["bn3"])
            y = _conv(y, k, b0, dtype=dtype)
            if ds:
                k, b0 = _fold(bp["downsample_conv"], bp["downsample_bn"],
                              bs["downsample_bn"])
                residual = _conv(x, k, b0, strides=s, dtype=dtype)
            x = nn.relu(y + residual)
            inplanes = planes * 4
    return x


class CONTRIQUE(nn.Module):
    anchor_size: int = 32
    projection_dim: int = 128
    layers: tuple[int, ...] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32
    # Fold frozen BNs into convs (exact algebra, _fold).  Measured r5:
    # the standalone tower gains 3-13% at B<=4, but IN-GRAPH the full
    # KSVQE step is neutral within the tunnel noise band at eval B=1/16
    # AND train (XLA already fuses the BN affine into the conv epilogue)
    # — so the default stays off and graph-identical to r4; the flag and
    # its exactness tests remain for re-measurement on other geometries.
    fold_bn: bool = False

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

        # The module path runs at init (creating the identical variable
        # tree either way) and when fold_bn is off; the folded path reads
        # the same tree directly (pattern as in nn/swin._fused_block).
        folded = (
            self.fold_bn
            and not self.is_initializing()
            and "params" in self.variables
        )
        if folded:
            p = self.variables["params"]["encoder"]
            s = self.variables["batch_stats"]["encoder"]
            last = _folded_trunk_final(
                p, s, patches, tuple(self.layers), self.dtype
            )
        else:
            feats = ResNetTrunk(
                layers=self.layers, dtype=self.dtype, name="encoder"
            )(patches, train=False)
            last = feats[-1]
        h = last.mean(axis=(1, 2)).astype(jnp.float32)  # (N, 2048)
        h = h / (jnp.linalg.norm(h, axis=1, keepdims=True) + 1e-12)

        def bn(name):
            return nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=_BN_EPS,
                name=name,
            )

        if folded:
            pv = self.variables["params"]
            sv = self.variables["batch_stats"]
            k, b0 = _fold(pv["projector_fc1"], pv["projector_bn1"],
                          sv["projector_bn1"])
            z = nn.relu(h @ k + b0)
            k, b0 = _fold(pv["projector_fc2"], pv["projector_bn2"],
                          sv["projector_bn2"])
            z = z @ k + b0
        else:
            z = nn.Dense(2048, use_bias=False, name="projector_fc1")(h)
            z = bn("projector_bn1")(z)
            z = nn.relu(z)
            z = nn.Dense(
                self.projection_dim, use_bias=False, name="projector_fc2"
            )(z)
            z = bn("projector_bn2")(z)
        return z.reshape(B, T, g, self.projection_dim)
