"""CLIP ViT-B/16 visual encoder with cls-token adapters — the KSVQE
"semantic tool".

Capability parity with the reference's vendored OpenAI CLIP visual tower
(models/backbones/clip/model.py:252-294) wrapped by
CLIP_extractor_addadapter_cls (CLIP_backbone.py:115-202):

  - patchify conv (16x16 stride 16, no bias), prepended class embedding,
    2D-resized positional embedding for arbitrary input sizes
    (resize_pos_embed2d, CLIP_backbone.py:35-69 — bicubic);
  - pre-LN transformer, QuickGELU MLPs;
  - residual cls-token adapter MLPs at ratio 0.5 from block
    ``clip_location`` onward (CLIP_backbone.py:176-191);
  - returns (cls_attn = cosine(cls, patches), cls_token, patch_tokens)
    *without* ln_post/proj (the extractor taps raw block output).

The tower is frozen except the adapters (CLIP_backbone.py:141-154);
freezing is enforced by the optimizer mask (kvq_tpu/train/optim.py), so the
module itself is an ordinary differentiable graph.  Weight import from the
OpenAI checkpoint happens via kvq_tpu/core/torch_import.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .cdm import AdapterMLP

from .layers import trunc_normal_init


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    """Standard MHA (torch nn.MultiheadAttention equivalent, in/out proj)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias=None):
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, N, h, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q) * hd**-0.5, heads(k), heads(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        if attn_bias is not None:
            attn = attn + attn_bias  # e.g. the text encoder's causal mask
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias=None):
        y = nn.LayerNorm(dtype=self.dtype, name="ln_1")(x)
        x = x + CLIPAttention(self.num_heads, dtype=self.dtype, name="attn")(
            y, attn_bias
        )
        y = nn.LayerNorm(dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(4 * x.shape[-1], dtype=self.dtype, name="mlp_c_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(x.shape[-1], dtype=self.dtype, name="mlp_c_proj")(y)
        return x + y


def resize_pos_embed_2d(pos_embed, src_grid: int, dst_grid: tuple[int, int]):
    """(1+S*S, C) -> (1+gh*gw, C) via bicubic resize of the grid part
    (reference resize_pos_embed2d, CLIP_backbone.py:35-69)."""
    gh, gw = dst_grid
    if (src_grid, src_grid) == (gh, gw):
        return pos_embed
    prefix, grid = pos_embed[:1], pos_embed[1:]
    grid = grid.reshape(src_grid, src_grid, -1)
    grid = jax.image.resize(grid, (gh, gw, grid.shape[-1]), method="bicubic")
    return jnp.concatenate([prefix, grid.reshape(gh * gw, -1)], axis=0)


class CLIPVisionTower(nn.Module):
    """ViT-B/16 visual trunk with cls adapters.

    Input (B, H, W, 3) CLIP-normalized; output
    (cls_attn (B, L), cls_token (B, C), patch_tokens (B, L, C)).
    """

    width: int = 768
    layers: int = 12
    heads: int = 12
    patch_size: int = 16
    image_grid: int = 14  # pretrained grid (224/16)
    clip_location: int = 8
    cls_use: bool = True
    adapter_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, self.width)

        class_embedding = self.param(
            "class_embedding", trunc_normal_init(0.02), (self.width,)
        )
        pos_embed = self.param(
            "positional_embedding",
            trunc_normal_init(0.01),
            (1 + self.image_grid**2, self.width),
        )
        cls = jnp.broadcast_to(
            class_embedding.astype(x.dtype), (B, 1, self.width)
        )
        x = jnp.concatenate([cls, x], axis=1)
        pe = resize_pos_embed_2d(pos_embed, self.image_grid, (gh, gw))
        x = x + pe.astype(x.dtype)[None]
        x = nn.LayerNorm(dtype=self.dtype, name="ln_pre")(x)

        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.heads, dtype=self.dtype, name=f"resblocks_{i}"
            )(x)
            if self.cls_use and i >= self.clip_location:
                # a named module per adapter — an inline nn.Sequential does
                # NOT scope its children (they registered as colliding
                # Dense_N leaves of the tower, breaking checkpoint naming)
                a = AdapterMLP(
                    self.width,
                    dtype=self.dtype,
                    name=f"adapter_layer_{i - self.clip_location}",
                )(x[:, :1])
                cls_tok = self.adapter_ratio * a + (1 - self.adapter_ratio) * x[:, :1]
                x = jnp.concatenate([cls_tok, x[:, 1:]], axis=1)

        cls_token = x[:, 0]
        pat_token = x[:, 1:]
        cf = cls_token.astype(jnp.float32)
        pf = pat_token.astype(jnp.float32)
        cls_attn = jnp.einsum("bc,blc->bl", cf, pf) / (
            jnp.linalg.norm(cf, axis=-1, keepdims=True)
            * jnp.linalg.norm(pf, axis=-1)
            + 1e-8
        )
        return cls_attn, cls_token, pat_token
