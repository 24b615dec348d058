"""Full CLIP model — text encoder, ModifiedResNet visual variant, and the
joint image/text embedding with a learned logit scale.

Capability parity with the reference's vendored OpenAI CLIP
(``models/backbones/clip/model.py``): ``ModifiedResNet`` (model.py:93),
``AttentionPool2d`` (model.py:56), text ``Transformer`` with a causal mask
and EOT pooling (``encode_text``, model.py:396-409), cosine-similarity
logits with ``logit_scale`` (model.py:411-427), and the shape-inferred
config from a torch state_dict (``build_model``, model.py:455).

The ViT visual tower lives in :mod:`kvq_tpu.nn.clip_vit` (it is the piece
KSVQE uses on the hot path); this module supplies the rest of the CLIP
surface so the framework can load/serve any OpenAI CLIP checkpoint, score
text prompts, and run the ResNet CLIP variants.  TPU-first notes: the
causal mask is a trace-time constant, EOT pooling is a one-hot matmul
(MXU) instead of a gather, and attention-pool runs as one batched MHA.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .clip_vit import CLIPVisionTower, ResidualAttentionBlock
from .layers import trunc_normal_init


class AttentionPool2d(nn.Module):
    """Query = mean token; single MHA over (mean ++ grid) with a learned
    positional embedding (reference clip/model.py:56-91)."""

    num_heads: int
    output_dim: int
    spacial_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) channels-last
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        pos = self.param(
            "positional_embedding",
            trunc_normal_init(C**-0.5),
            (self.spacial_dim**2 + 1, C),
        )
        x = x + pos.astype(x.dtype)[None]
        h, hd = self.num_heads, C // self.num_heads
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(x[:, :1])
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(x)

        def heads(t):
            return t.reshape(B, t.shape[1], h, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q) * hd**-0.5, heads(k), heads(v)
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(out)
        return out[:, 0]


class _ModifiedBottleneck(nn.Module):
    """CLIP-ResNet bottleneck: 3 convs with avg-pool anti-aliased stride
    (reference clip/model.py:12-53)."""

    planes: int
    stride: int = 1
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

        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        if self.stride > 1:  # avgpool before the expand conv
            out = nn.avg_pool(out, (self.stride,) * 2, (self.stride,) * 2)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            idn = x
            if self.stride > 1:
                idn = nn.avg_pool(
                    idn, (self.stride,) * 2, (self.stride,) * 2
                )
            idn = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                          dtype=self.dtype, name="downsample_conv")(idn)
            idn = bn("downsample_bn")(idn)
        else:
            idn = x
        return nn.relu(out + idn)


class ModifiedResNet(nn.Module):
    """CLIP's anti-aliased ResNet visual tower: 3-conv stem + avgpool,
    4 bottleneck stages, attention-pool head (reference clip/model.py:93-146).
    Input (B, H, W, 3) channels-last; output (B, output_dim)."""

    layers: tuple[int, int, int, int] = (3, 4, 6, 3)
    output_dim: int = 1024
    heads: int = 32
    width: int = 64
    input_resolution: int = 224
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

        x = x.astype(self.dtype)
        # 3-layer stem, stride 2 on the first conv
        x = nn.Conv(self.width // 2, (3, 3), strides=2, padding=1,
                    use_bias=False, dtype=self.dtype, name="stem_conv1")(x)
        x = nn.relu(bn("stem_bn1")(x))
        x = nn.Conv(self.width // 2, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv2")(x)
        x = nn.relu(bn("stem_bn2")(x))
        x = nn.Conv(self.width, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv3")(x)
        x = nn.relu(bn("stem_bn3")(x))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        for stage, blocks in enumerate(self.layers):
            planes = self.width * 2**stage
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                x = _ModifiedBottleneck(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    downsample=b == 0,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train=train)

        embed_dim = self.width * 32
        return AttentionPool2d(
            num_heads=self.heads,
            output_dim=self.output_dim,
            spacial_dim=self.input_resolution // 32,
            dtype=self.dtype,
            name="attnpool",
        )(x)


class TextTransformer(nn.Module):
    """CLIP text encoder: token embed + learned pos embed + causal
    pre-LN transformer + EOT-token projection (reference
    clip/model.py:340-409)."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text):
        # text: (B, L) int tokens, zero-padded after the EOT token
        tok = self.param(
            "token_embedding",
            trunc_normal_init(0.02),
            (self.vocab_size, self.width),
        )
        pos = self.param(
            "positional_embedding",
            trunc_normal_init(0.01),
            (self.context_length, self.width),
        )
        L = text.shape[1]
        x = tok.astype(self.dtype)[text] + pos.astype(self.dtype)[None, :L]
        # causal mask as a trace-time constant additive bias
        causal = jnp.triu(
            jnp.full((L, L), -jnp.inf, dtype=jnp.float32), k=1
        )
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.heads,
                dtype=self.dtype,
                name=f"resblocks_{i}",
            )(x, attn_bias=causal)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_final")(x)
        # EOT pooling = highest token id per row; one-hot matmul keeps it
        # on the MXU instead of a data-dependent gather.
        eot = jax.nn.one_hot(
            jnp.argmax(text, axis=-1), L, dtype=x.dtype
        )
        pooled = jnp.einsum("bl,blc->bc", eot, x)
        proj = self.param(
            "text_projection",
            trunc_normal_init(self.width**-0.5),
            (self.width, self.embed_dim),
        )
        return pooled @ proj.astype(pooled.dtype)


@dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # vision
    vision_width: int = 768
    vision_layers: tuple | int = 12  # tuple => ModifiedResNet stage counts
    vision_patch_size: int | None = 16
    image_resolution: int = 224
    # text
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12


def clip_config_from_state_dict(sd) -> CLIPConfig:
    """Infer the architecture from a torch CLIP state_dict — the counterpart
    of reference ``build_model`` (clip/model.py:455-482)."""
    if "visual.proj" in sd:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len(
            {
                k.split(".")[3]
                for k in sd
                if k.startswith("visual.transformer.resblocks")
            }
        )
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        grid = round(
            (sd["visual.positional_embedding"].shape[0] - 1) ** 0.5
        )
        image_resolution = vision_patch_size * grid
    else:
        counts = [
            len(
                {
                    k.split(".")[2]
                    for k in sd
                    if k.startswith(f"visual.layer{b}")
                }
            )
            for b in (1, 2, 3, 4)
        ]
        vision_layers = tuple(counts)
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        out_width = round(
            (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5
        )
        vision_patch_size = None
        image_resolution = out_width * 32
    return CLIPConfig(
        embed_dim=sd["text_projection"].shape[1],
        vision_width=vision_width,
        vision_layers=vision_layers,
        vision_patch_size=vision_patch_size,
        image_resolution=image_resolution,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=max(1, sd["ln_final.weight"].shape[0] // 64),
        transformer_layers=len(
            {
                k.split(".")[2]
                for k in sd
                if k.startswith("transformer.resblocks")
            }
        ),
    )


class CLIP(nn.Module):
    """Joint image/text CLIP (reference clip/model.py:299-427).

    ``encode_image`` / ``encode_text`` return unnormalized embeddings;
    ``__call__`` returns (logits_per_image, logits_per_text) with the
    learned temperature, like the reference forward (model.py:411-427).
    """

    config: CLIPConfig = field(default_factory=CLIPConfig)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        if isinstance(cfg.vision_layers, (tuple, list)):
            self.visual = ModifiedResNet(
                layers=tuple(cfg.vision_layers),
                output_dim=cfg.embed_dim,
                heads=cfg.vision_width // 2,
                width=cfg.vision_width,
                input_resolution=cfg.image_resolution,
                dtype=self.dtype,
                name="visual",
            )
            self._vit = False
        else:
            self.visual = CLIPVisionTower(
                width=cfg.vision_width,
                layers=cfg.vision_layers,
                heads=max(1, cfg.vision_width // 64),
                patch_size=cfg.vision_patch_size or 16,
                image_grid=cfg.image_resolution
                // (cfg.vision_patch_size or 16),
                cls_use=False,  # plain CLIP: no KSVQE adapters
                dtype=self.dtype,
                name="visual",
            )
            self._vit = True
            self.visual_ln_post = nn.LayerNorm(
                dtype=self.dtype, name="visual_ln_post"
            )
            self.visual_proj = self.param(
                "visual_proj",
                trunc_normal_init(cfg.vision_width**-0.5),
                (cfg.vision_width, cfg.embed_dim),
            )
        self.text = TextTransformer(
            vocab_size=cfg.vocab_size,
            context_length=cfg.context_length,
            width=cfg.transformer_width,
            layers=cfg.transformer_layers,
            heads=cfg.transformer_heads,
            embed_dim=cfg.embed_dim,
            dtype=self.dtype,
            name="text",
        )
        # ln(1/0.07) init (reference model.py:336)
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, float(np.log(1 / 0.07))),
            (),
        )

    def encode_image(self, image, *, train: bool = False):
        if self._vit:
            _, cls_token, _ = self.visual(image)
            x = self.visual_ln_post(cls_token)
            return x @ self.visual_proj.astype(x.dtype)
        return self.visual(image, train=train)

    def encode_text(self, text):
        return self.text(text)

    def __call__(self, image, text, *, train: bool = False):
        img = self.encode_image(image, train=train).astype(jnp.float32)
        txt = self.encode_text(text).astype(jnp.float32)
        img = img / (jnp.linalg.norm(img, axis=-1, keepdims=True) + 1e-8)
        txt = txt / (jnp.linalg.norm(txt, axis=-1, keepdims=True) + 1e-8)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


def load_clip(path: str, dtype=jnp.float32):
    """Counterpart of the reference's ``clip.load`` (clip/clip.py:86-183),
    minus the URL download (this build takes a local checkpoint path; the
    reference's sha256-checked ``_download`` assumes network access).

    Loads an OpenAI CLIP torch checkpoint, infers the architecture from the
    state dict (like reference ``build_model``), converts the weights, and
    returns ``(model, variables)`` ready for ``model.apply``.
    """
    from ..core.torch_import import convert_clip_full, load_torch_state_dict

    sd = load_torch_state_dict(path)
    cfg = clip_config_from_state_dict(sd)
    model = CLIP(config=cfg, dtype=dtype)
    params, stats = convert_clip_full(sd)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return model, variables
