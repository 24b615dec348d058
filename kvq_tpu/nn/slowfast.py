"""SlowFast-R50 video backbone — the motion-feature extractor.

The reference runs a frozen pytorchvideo ``slowfast_r50`` over per-second
32-frame clips and saves pooled slow (2048-d) / fast (256-d) features per
clip (SlowFast_features.py:21,137-165,191-197).  This is the TPU-native
equivalent: standard SlowFast-R50 (alpha=4, beta=1/8, fast temporal kernel
3 everywhere, slow temporal kernels 1,1,3,3 per stage, (7,1,1)
stride-(4,1,1) lateral fusion convs), channels-last, BatchNorm running
stats.

Inputs are channels-last clips (B, 32, H, W, 3) normalized with the
``slowfast`` profile ((x/255 - 0.45)/0.225, SlowFast_features.py:76-80).
``pack_pathways`` subsamples the slow path exactly like the reference
(every 4th frame via linspace indices, :126-131).

Output: (slow_feat (B, 2048), fast_feat (B, 256)) — globally average
pooled, matching the saved .npy features.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def pack_pathways(frames):
    """(B, T, H, W, C) -> (slow (B, T//4, ...), fast) — reference
    pack_pathway_output (SlowFast_features.py:112-135)."""
    t = frames.shape[1]
    idx = np.linspace(0, t - 1, t // 4).astype(np.int64)
    return frames[:, idx], frames


class _Bottleneck3D(nn.Module):
    planes: int
    t_kernel: int  # temporal kernel of the 3x3 conv... (applied on conv1 a la slowfast)
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name=name,
            )

        residual = x
        tk = self.t_kernel
        # SlowFast puts the temporal kernel on the first 1x1 conv
        y = nn.Conv(
            self.planes,
            kernel_size=(tk, 1, 1),
            padding=((tk // 2, tk // 2), (0, 0), (0, 0)),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(
            self.planes,
            kernel_size=(1, 3, 3),
            strides=(1, self.strides, self.strides),
            padding=((0, 0), (1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(
            self.planes * 4, (1, 1, 1), use_bias=False, dtype=self.dtype,
            name="conv3",
        )(y)
        y = bn("bn3")(y)
        if self.downsample:
            residual = nn.Conv(
                self.planes * 4,
                (1, 1, 1),
                strides=(1, self.strides, self.strides),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class _Pathway(nn.Module):
    """One pathway's stage stack; lateral inputs are concatenated by the
    parent before each stage.

    Submodules are defined in ``setup`` (NOT created inside the ``stem``/
    ``stage`` methods — flax only permits submodule creation in ``setup``
    or a compact method, and the parent drives these methods directly).
    """

    width: int  # 64 slow, 8 fast
    t_kernels: tuple[int, int, int, int]
    stem_t: int
    layers: tuple[int, ...] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        t = self.stem_t
        self.stem_conv = nn.Conv(
            self.width,
            kernel_size=(t, 7, 7),
            strides=(1, 2, 2),
            padding=((t // 2, t // 2), (3, 3), (3, 3)),
            use_bias=False,
            dtype=self.dtype,
        )
        self.stem_bn = nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )
        blocks = []
        for idx, n_blocks in enumerate(self.layers):
            planes = self.width * (2**idx)
            strides = 1 if idx == 0 else 2
            stage = []
            for b in range(n_blocks):
                # the first block of every stage changes channel count
                # (stage 0: stem/lateral channels != 4*planes) or strides,
                # so it always carries the projection shortcut
                stage.append(
                    _Bottleneck3D(
                        planes=planes,
                        t_kernel=self.t_kernels[idx],
                        strides=strides if b == 0 else 1,
                        downsample=(b == 0),
                        dtype=self.dtype,
                        name=f"res{idx + 2}_{b}",
                    )
                )
            blocks.append(stage)
        self.blocks = blocks

    def stem(self, x, train):
        x = self.stem_conv(x)
        x = self.stem_bn(x, use_running_average=not train)
        x = nn.relu(x)
        return nn.max_pool(
            x, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1))
        )

    def stage(self, x, idx, train):
        for block in self.blocks[idx]:
            x = block(x, train=train)
        return x


class SlowFastR50(nn.Module):
    alpha: int = 4
    beta_inv: int = 8
    layers: tuple[int, ...] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, slow, fast, *, train: bool = False):
        """slow (B, T/4, H, W, 3), fast (B, T, H, W, 3) ->
        (slow_feat (B, 2048), fast_feat (B, 256))."""
        slow_path = _Pathway(
            width=64, t_kernels=(1, 1, 3, 3), stem_t=1, layers=self.layers,
            dtype=self.dtype, name="slow",
        )
        fast_path = _Pathway(
            width=64 // self.beta_inv,
            t_kernels=(3, 3, 3, 3),
            stem_t=5,
            layers=self.layers,
            dtype=self.dtype,
            name="fast",
        )
        s = slow_path.stem(slow.astype(self.dtype), train)
        f = fast_path.stem(fast.astype(self.dtype), train)
        s = self._fuse(s, f, 0, train)
        for i in range(len(self.layers)):
            s = slow_path.stage(s, i, train)
            f = fast_path.stage(f, i, train)
            if i < len(self.layers) - 1:
                s = self._fuse(s, f, i + 1, train)
        slow_feat = s.astype(jnp.float32).mean(axis=(1, 2, 3))
        fast_feat = f.astype(jnp.float32).mean(axis=(1, 2, 3))
        return slow_feat, fast_feat

    def _fuse(self, s, f, idx, train=False):
        """Fast->slow lateral: (7,1,1) conv stride (alpha,1,1) to
        2*beta*C_fast channels, concatenated onto slow."""
        out_ch = f.shape[-1] * 2
        lat = nn.Conv(
            out_ch,
            kernel_size=(7, 1, 1),
            strides=(self.alpha, 1, 1),
            padding=((3, 3), (0, 0), (0, 0)),
            use_bias=False,
            dtype=self.dtype,
            name=f"lateral_{idx}_conv",
        )(f)
        lat = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=f"lateral_{idx}_bn",
        )(lat)
        lat = nn.relu(lat)
        return jnp.concatenate([s, lat], axis=-1)
