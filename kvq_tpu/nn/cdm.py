"""CDM — semantic/distortion modulation blocks of KSVQE.

Counterparts (reference KSVQE_model.py):
  - :class:`CrossAttention`   == crossattention1 (:1553-1591): q from x,
    k/v from tokens, NO output projection, scale 1/sqrt(dim) (the FULL
    model dim, not head dim — reference quirk, kept);
  - :class:`TemporalAttention` == Attention (:1508-1551): qkv linear
    (no bias), per-head scale, output projection;
  - :class:`SemanticFiLM`     == Semantic_Transformation2 (:817-835):
    spatial FiLM — 1x1 convs produce 1-channel gamma (sigmoid) and beta;
  - :class:`DistFiLM`         == Dist_Transformation3 (:934-960): channel
    FiLM from global avg/std pools of the enhanced distortion field.

The reference's unused variants are also rebuilt for surface parity
(SURVEY.md §5.1.13): :class:`SemanticFiLM4`/:class:`SemanticFiLM6`/
:class:`SemanticFiLM8` (== Semantic_Transformation4/6/8) and
:class:`DistFiLM5`/:class:`DistFiLM7` (== Dist_Transformation5/7).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _pallas_backend_ok() -> bool:
    """Mosaic kernels need a TPU backend; tests force the CPU interpreter
    by monkeypatching the kernel AND setting ALLOW_CPU_PALLAS (same
    contract as nn/swin.py)."""
    from ..ops import window_attention as WA

    return jax.default_backend() == "tpu" or getattr(
        WA, "ALLOW_CPU_PALLAS", False
    )


class CrossAttention(nn.Module):
    """crossattention1 parity (reference KSVQE_model.py:1553-1591).

    Returns ``(out, attn_map)`` where ``attn_map`` is the head-averaged
    (B, Nq, Nk) attention — EXCEPT on the ``use_pallas`` eval path, which
    returns ``(out, None)``: the flash kernel never materializes the
    probability plane, so there is nothing to average.  Callers that need
    the map must take the XLA path (``use_pallas=False`` or
    ``train=True``); in-repo callers discard it.
    """

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    # eval-only Pallas flash path (scores never leave VMEM) — fixes the
    # superlinear batch scaling of the XLA composition at CDM shapes
    # (tools/profile_cdm.py, tools/profile_cdm_variants.py); the kernel is
    # forward-only, so training keeps the XLA form
    use_pallas: bool = False

    @nn.compact
    def __call__(self, q_tokens, kv_tokens, *, train: bool = False):
        # q_tokens: (B, Nq, C); kv_tokens: (B, Nk, C)
        B, Nq, C = q_tokens.shape
        h = self.num_heads
        hd = C // h
        q = nn.Dense(C, dtype=self.dtype, name="fc_q")(q_tokens)
        k = nn.Dense(C, dtype=self.dtype, name="fc_k")(kv_tokens)
        v = nn.Dense(C, dtype=self.dtype, name="fc_v")(kv_tokens)

        # reference scale: 1/sqrt(dim_V) with dim_V = full C
        if self.use_pallas and not train and _pallas_backend_ok():
            from ..ops import window_attention as WA

            # channel-layout kernel: consumes the Dense outputs directly,
            # no (B, h, N, hd) transpose round-trips through HBM
            out = WA.flash_attention_nobias_cl(
                q, k, v, num_heads=h, scale=C ** -0.5
            )
            return out, None

        def heads(t):
            return t.reshape(B, -1, h, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(C))
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
        return out, attn.mean(axis=1)


class TemporalAttention(nn.Module):
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False  # eval-only flash path, see CrossAttention

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(3 * C, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, N, h, hd).transpose(0, 2, 1, 3)

        if self.use_pallas and not train and _pallas_backend_ok():
            from ..ops import window_attention as WA

            out = WA.flash_attention_nobias_cl(
                q, k, v, num_heads=h, scale=hd ** -0.5
            )
            return nn.Dense(C, dtype=self.dtype, name="to_out")(out)
        q, k, v = heads(q) * hd**-0.5, heads(k), heads(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class SemanticFiLM(nn.Module):
    """gamma/beta spatial modulation: out = sigmoid(conv_g(x)) * input +
    conv_b(x); convs are 1x1 to a single channel."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inp):
        # x, inp: (N, H, W, C) channels-last
        gamma = jax.nn.sigmoid(
            nn.Dense(1, dtype=self.dtype, name="conv_gama")(x)
        )
        beta = nn.Dense(1, dtype=self.dtype, name="conv_beta")(x)
        return gamma * inp + beta


class DistFiLM(nn.Module):
    """Channel FiLM from avg/std pools over (T,H,W) of the distortion field
    (torch.std default = unbiased, matched)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inp):
        # x: (B, T, H, W, C); inp: (B, T*H*W, C)
        B = x.shape[0]
        C = x.shape[-1]
        xf = x.reshape(B, -1, C).astype(jnp.float32)
        n = xf.shape[1]
        mean = xf.mean(axis=1)
        var = xf.var(axis=1) * (n / max(n - 1, 1))
        std = jnp.sqrt(var + 1e-10)  # finite grad at zero-variance channels
        gamma = jax.nn.sigmoid(
            nn.Dense(C, dtype=self.dtype, name="get_gamma")(std.astype(self.dtype))
        )
        beta = nn.Dense(C, dtype=self.dtype, name="get_beta")(
            mean.astype(self.dtype)
        )
        return gamma[:, None, :] * inp + beta[:, None, :]


class AdapterMLP(nn.Module):
    """Linear(d_in, d_in/4) -> ReLU -> Linear(d_in/4, d_out) -> ReLU —
    the shape of every adapter in KSVQE (semantic_adapter,
    distortion_adapter, dist_adapter; KSVQE_model.py:1080-1084,1174-1186)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(d // 4, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return nn.relu(x)


def _avg_std_channel_pool(x, eps: float = 1e-10):
    """Global per-channel mean + unbiased std over all non-channel axes of a
    channels-last tensor collapsed to (N, S, C)."""
    n = x.shape[1]
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=1)
    var = xf.var(axis=1) * (n / max(n - 1, 1))
    return mean, jnp.sqrt(var + eps)


class SemanticFiLM4(nn.Module):
    """Channel FiLM from avg/std pools of the semantic field (reference
    Semantic_Transformation4, KSVQE_model.py:837-867 — defined but unused
    by any config, rebuilt for surface parity)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inp):
        # x, inp: (N, H, W, C)
        N, C = x.shape[0], x.shape[-1]
        mean, std = _avg_std_channel_pool(x.reshape(N, -1, C))
        gamma = jax.nn.sigmoid(
            nn.Dense(C, dtype=self.dtype, name="get_gamma")(
                std.astype(self.dtype)
            )
        )
        beta = nn.Dense(C, dtype=self.dtype, name="get_beta")(
            mean.astype(self.dtype)
        )
        return gamma[:, None, None, :] * inp + beta[:, None, None, :]


class SemanticFiLM6(nn.Module):
    """Spatial FiLM followed by channel FiLM (reference
    Semantic_Transformation6, KSVQE_model.py:869-911, unused).  The
    reference computes the channel gamma with ``get_beta(mean)`` — its
    ``get_gamma`` layer is dead (a latent bug in dead code); replicated
    faithfully so a weight import stays 1:1."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inp):
        N, C = x.shape[0], x.shape[-1]
        sgamma = jax.nn.sigmoid(
            nn.Dense(1, dtype=self.dtype, name="conv_gama")(x)
        )
        sbeta = nn.Dense(1, dtype=self.dtype, name="conv_beta")(x)
        inp1 = sgamma * inp + sbeta
        mean, std = _avg_std_channel_pool(x.reshape(N, -1, C))
        get_beta = nn.Dense(C, dtype=self.dtype, name="get_beta")
        cgamma = jax.nn.sigmoid(get_beta(mean.astype(self.dtype)))
        cbeta = get_beta(std.astype(self.dtype))
        return cgamma[:, None, None, :] * inp1 + cbeta[:, None, None, :]


class SemanticFiLM8(nn.Module):
    """3x3 conv + LeakyReLU feature, then spatial FiLM (reference
    Semantic_Transformation8, KSVQE_model.py:913-931, unused)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inp):
        C = x.shape[-1]
        out = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        out = nn.leaky_relu(out, negative_slope=0.2)
        gamma = jax.nn.sigmoid(
            nn.Dense(1, dtype=self.dtype, name="conv_gama")(out)
        )
        beta = nn.Dense(1, dtype=self.dtype, name="conv_beta")(out)
        return gamma * inp + beta


class DistFiLM5(nn.Module):
    """Token-wise (spatial) FiLM from 3x3x3 convs over the distortion field
    (reference Dist_Transformation5, KSVQE_model.py:962-987, unused)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inp):
        # x: (B, T, H, W, C); inp: (B, T*H*W, C)
        B = x.shape[0]
        gamma = jax.nn.sigmoid(
            nn.Conv(1, (3, 3, 3), padding=1, dtype=self.dtype,
                    name="conv_gama")(x)
        ).reshape(B, -1, 1)
        beta = nn.Conv(1, (3, 3, 3), padding=1, dtype=self.dtype,
                       name="conv_beta")(x).reshape(B, -1, 1)
        return gamma * inp + beta


class DistFiLM7(nn.Module):
    """Token-wise FiLM then channel FiLM (reference Dist_Transformation7,
    KSVQE_model.py:989-1021, unused)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inp):
        B, C = x.shape[0], x.shape[-1]
        sgamma = jax.nn.sigmoid(
            nn.Conv(1, (3, 3, 3), padding=1, dtype=self.dtype,
                    name="conv_gama")(x)
        ).reshape(B, -1, 1)
        sbeta = nn.Conv(1, (3, 3, 3), padding=1, dtype=self.dtype,
                        name="conv_beta")(x).reshape(B, -1, 1)
        inp1 = sgamma * inp + sbeta
        mean, std = _avg_std_channel_pool(x.reshape(B, -1, C))
        gamma = jax.nn.sigmoid(
            nn.Dense(C, dtype=self.dtype, name="get_gamma")(
                std.astype(self.dtype)
            )
        )
        beta = nn.Dense(C, dtype=self.dtype, name="get_beta")(
            mean.astype(self.dtype)
        )
        return gamma[:, None, :] * inp1 + beta[:, None, :]
