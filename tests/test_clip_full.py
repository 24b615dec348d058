"""Full-CLIP surface: BPE tokenizer, text encoder, AttentionPool2d /
ModifiedResNet visual tower, state-dict shape inference, joint logits.

Parity targets are golden torch modules written here from the reference
semantics (clip/model.py, clip/simple_tokenizer.py) — not reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from kvq_tpu.core import torch_import as TI
from kvq_tpu.data.tokenizer import SimpleTokenizer, bytes_to_unicode, tokenize
from kvq_tpu.nn.clip_model import (
    CLIP,
    AttentionPool2d,
    CLIPConfig,
    ModifiedResNet,
    TextTransformer,
    clip_config_from_state_dict,
)

pytestmark = pytest.mark.slow  # model-assembly/e2e: minutes on small hosts


# --------------------------------------------------------------------------
# tokenizer


def _tiny_tokenizer():
    # merges built over byte-symbols: 'l l', then 'he', 'll</w>' etc.
    merges = [
        ("l", "l"),
        ("h", "e"),
        ("he", "ll"),
        ("hell", "o</w>"),
        ("w", "o"),
        ("wo", "r"),
        ("wor", "l"),
        ("worl", "d</w>"),
    ]
    return SimpleTokenizer(merges=merges)


def test_bytes_to_unicode_reversible():
    enc = bytes_to_unicode()
    assert len(enc) == 256
    assert len(set(enc.values())) == 256


def test_tokenizer_roundtrip():
    tok = _tiny_tokenizer()
    ids = tok.encode("Hello   WORLD")
    assert ids, "non-empty token ids"
    assert tok.decode(ids).strip() == "hello world"


def test_tokenizer_merges_apply():
    tok = _tiny_tokenizer()
    # 'hello' should fully merge into the single 'hello</w>' token
    assert tok.bpe("hello") == "hello</w>"
    assert tok.bpe("world") == "world</w>"
    # unseen word falls back to byte symbols + </w>
    assert " " in tok.bpe("xyz")


def test_tokenize_matrix():
    tok = _tiny_tokenizer()
    mat = tokenize(["hello world", "hello"], tok, context_length=8)
    assert mat.shape == (2, 8) and mat.dtype == np.int32
    assert mat[0, 0] == tok.sot_token
    assert tok.eot_token in mat[0]
    # zero padding after EOT
    eot_pos = int(np.argmax(mat[1] == tok.eot_token))
    assert (mat[1, eot_pos + 1 :] == 0).all()


def test_tokenize_truncate():
    tok = _tiny_tokenizer()
    with pytest.raises(RuntimeError):
        tokenize("hello " * 50, tok, context_length=8)
    mat = tokenize("hello " * 50, tok, context_length=8, truncate=True)
    assert mat[0, -1] == tok.eot_token


# --------------------------------------------------------------------------
# text transformer vs golden torch


class GoldenTextCLIP(torch.nn.Module):
    """Reference-semantics text encoder (clip/model.py:340-409) built from
    torch primitives: causal-masked pre-LN resblocks + EOT pooling."""

    def __init__(self, vocab, ctx, width, layers, heads, embed_dim):
        super().__init__()
        self.token_embedding = torch.nn.Embedding(vocab, width)
        self.positional_embedding = torch.nn.Parameter(
            torch.randn(ctx, width) * 0.01
        )
        self.blocks = torch.nn.ModuleList()
        for _ in range(layers):
            blk = torch.nn.ModuleDict(
                {
                    "ln_1": torch.nn.LayerNorm(width),
                    "attn": torch.nn.MultiheadAttention(width, heads),
                    "ln_2": torch.nn.LayerNorm(width),
                    "c_fc": torch.nn.Linear(width, width * 4),
                    "c_proj": torch.nn.Linear(width * 4, width),
                }
            )
            self.blocks.append(blk)
        self.ln_final = torch.nn.LayerNorm(width)
        self.text_projection = torch.nn.Parameter(
            torch.randn(width, embed_dim) * width**-0.5
        )
        mask = torch.full((ctx, ctx), float("-inf"))
        self.register_buffer("mask", torch.triu(mask, diagonal=1))

    def forward(self, text):
        x = self.token_embedding(text) + self.positional_embedding
        x = x.permute(1, 0, 2)  # LND
        L = x.shape[0]
        for blk in self.blocks:
            y = blk["ln_1"](x)
            a, _ = blk["attn"](
                y, y, y, need_weights=False, attn_mask=self.mask[:L, :L]
            )
            x = x + a
            y = blk["ln_2"](x)
            y = blk["c_proj"](
                torch.sigmoid(1.702 * blk["c_fc"](y)) * blk["c_fc"](y)
            )
            x = x + y
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), text.argmax(dim=-1)]
        return pooled @ self.text_projection


def _golden_text_sd(m: GoldenTextCLIP):
    sd = {}
    sd["token_embedding.weight"] = m.token_embedding.weight.detach().numpy()
    sd["positional_embedding"] = m.positional_embedding.detach().numpy()
    for i, blk in enumerate(m.blocks):
        pre = f"transformer.resblocks.{i}"
        a = blk["attn"]
        sd[f"{pre}.attn.in_proj_weight"] = a.in_proj_weight.detach().numpy()
        sd[f"{pre}.attn.in_proj_bias"] = a.in_proj_bias.detach().numpy()
        sd[f"{pre}.attn.out_proj.weight"] = a.out_proj.weight.detach().numpy()
        sd[f"{pre}.attn.out_proj.bias"] = a.out_proj.bias.detach().numpy()
        for ln in ("ln_1", "ln_2"):
            sd[f"{pre}.{ln}.weight"] = blk[ln].weight.detach().numpy()
            sd[f"{pre}.{ln}.bias"] = blk[ln].bias.detach().numpy()
        sd[f"{pre}.mlp.c_fc.weight"] = blk["c_fc"].weight.detach().numpy()
        sd[f"{pre}.mlp.c_fc.bias"] = blk["c_fc"].bias.detach().numpy()
        sd[f"{pre}.mlp.c_proj.weight"] = blk["c_proj"].weight.detach().numpy()
        sd[f"{pre}.mlp.c_proj.bias"] = blk["c_proj"].bias.detach().numpy()
    sd["ln_final.weight"] = m.ln_final.weight.detach().numpy()
    sd["ln_final.bias"] = m.ln_final.bias.detach().numpy()
    sd["text_projection"] = m.text_projection.detach().numpy()
    return sd


def test_text_transformer_parity():
    torch.manual_seed(0)
    vocab, ctx, width, layers, heads, embed = 50, 12, 32, 2, 4, 16
    golden = GoldenTextCLIP(vocab, ctx, width, layers, heads, embed).eval()
    text = torch.randint(1, vocab - 1, (3, ctx))
    text[:, 0] = vocab - 2
    text[:, 5] = vocab - 1  # EOT = max id at position 5
    text[:, 6:] = 0
    with torch.no_grad():
        want = golden(text).numpy()

    sd = _golden_text_sd(golden)
    p = {}
    TI._set(p, "token_embedding", sd["token_embedding.weight"])
    TI._set(p, "positional_embedding", sd["positional_embedding"])
    TI._convert_attn_blocks(p, sd, "transformer.resblocks", "", layers)
    TI._ln(p, "ln_final", sd, "ln_final")
    TI._set(p, "text_projection", sd["text_projection"])

    model = TextTransformer(
        vocab_size=vocab, context_length=ctx, width=width,
        layers=layers, heads=heads, embed_dim=embed, dtype=jnp.float32,
    )
    got = model.apply({"params": p}, jnp.asarray(text.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


# --------------------------------------------------------------------------
# attention pool vs torch F.multi_head_attention_forward


def test_attention_pool_parity():
    torch.manual_seed(1)
    B, H, W, C, heads, out = 2, 3, 3, 16, 4, 8
    q_w = torch.randn(C, C) * 0.2
    k_w = torch.randn(C, C) * 0.2
    v_w = torch.randn(C, C) * 0.2
    c_w = torch.randn(out, C) * 0.2
    q_b, k_b, v_b = torch.randn(C), torch.randn(C), torch.randn(C)
    c_b = torch.randn(out)
    pos = torch.randn(H * W + 1, C) * 0.3
    x = torch.randn(B, C, H, W)

    with torch.no_grad():
        t = x.flatten(start_dim=2).permute(2, 0, 1)  # (HW, B, C)
        t = torch.cat([t.mean(dim=0, keepdim=True), t], dim=0)
        t = t + pos[:, None]
        want, _ = F.multi_head_attention_forward(
            query=t[:1], key=t, value=t,
            embed_dim_to_check=C, num_heads=heads,
            q_proj_weight=q_w, k_proj_weight=k_w, v_proj_weight=v_w,
            in_proj_weight=None,
            in_proj_bias=torch.cat([q_b, k_b, v_b]),
            bias_k=None, bias_v=None, add_zero_attn=False,
            dropout_p=0.0,
            out_proj_weight=c_w, out_proj_bias=c_b,
            use_separate_proj_weight=True, need_weights=False,
        )
        want = want[0].numpy()  # (B, out)

    p = {"positional_embedding": pos.numpy()}
    for name, w, b in (
        ("q_proj", q_w, q_b), ("k_proj", k_w, k_b),
        ("v_proj", v_w, v_b), ("c_proj", c_w, c_b),
    ):
        TI._set(p, f"{name}/kernel", TI.linear(w.numpy()))
        TI._set(p, f"{name}/bias", b.numpy())

    pool = AttentionPool2d(
        num_heads=heads, output_dim=out, spacial_dim=H, dtype=jnp.float32
    )
    got = pool.apply(
        {"params": p}, jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


# --------------------------------------------------------------------------
# ModifiedResNet + config inference + joint model


def test_modified_resnet_shapes():
    m = ModifiedResNet(
        layers=(1, 1, 1, 1), output_dim=24, heads=4, width=8,
        input_resolution=64, dtype=jnp.float32,
    )
    x = jnp.zeros((2, 64, 64, 3))
    vs = m.init(jax.random.key(0), x, train=False)
    y = m.apply(vs, x, train=False)
    assert y.shape == (2, 24)


def test_clip_config_from_state_dict_vit():
    width, layers, patch, grid = 32, 3, 4, 5
    sd = {
        "visual.proj": np.zeros((width, 16)),
        "visual.conv1.weight": np.zeros((width, 3, patch, patch)),
        "visual.positional_embedding": np.zeros((1 + grid * grid, width)),
        "text_projection": np.zeros((24, 16)),
        "positional_embedding": np.zeros((7, 24)),
        "token_embedding.weight": np.zeros((99, 24)),
        "ln_final.weight": np.zeros((64,)),
    }
    for i in range(layers):
        sd[f"visual.transformer.resblocks.{i}.x"] = 0
    for i in range(2):
        sd[f"transformer.resblocks.{i}.x"] = 0
    cfg = clip_config_from_state_dict(sd)
    assert cfg.vision_layers == layers
    assert cfg.vision_patch_size == patch
    assert cfg.image_resolution == patch * grid
    assert cfg.embed_dim == 16
    assert cfg.vocab_size == 99
    assert cfg.context_length == 7
    assert cfg.transformer_width == 64
    assert cfg.transformer_layers == 2


def test_clip_joint_logits():
    cfg = CLIPConfig(
        embed_dim=16, vision_width=32, vision_layers=2,
        vision_patch_size=8, image_resolution=32, context_length=10,
        vocab_size=50, transformer_width=32, transformer_heads=4,
        transformer_layers=2,
    )
    model = CLIP(config=cfg, dtype=jnp.float32)
    img = jnp.zeros((2, 32, 32, 3))
    txt = jnp.asarray(
        np.random.default_rng(0).integers(1, 49, size=(3, 10)), jnp.int32
    )
    vs = model.init(jax.random.key(0), img, txt, train=False)
    li, lt = model.apply(vs, img, txt, train=False)
    assert li.shape == (2, 3) and lt.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, atol=1e-5)


def test_clip_resnet_joint():
    cfg = CLIPConfig(
        embed_dim=16, vision_width=8, vision_layers=(1, 1, 1, 1),
        vision_patch_size=None, image_resolution=64, context_length=10,
        vocab_size=50, transformer_width=32, transformer_heads=4,
        transformer_layers=1,
    )
    model = CLIP(config=cfg, dtype=jnp.float32)
    img = jnp.zeros((2, 64, 64, 3))
    txt = jnp.asarray(
        np.random.default_rng(1).integers(1, 49, size=(2, 10)), jnp.int32
    )
    vs = model.init(jax.random.key(0), img, txt, train=False)
    li, _ = model.apply(vs, img, txt, train=False)
    assert li.shape == (2, 2)


def test_load_clip_from_torch_checkpoint(tmp_path):
    """End-to-end: synthetic tiny OpenAI-format ViT CLIP checkpoint ->
    load_clip (shape inference + conversion) -> forward."""
    from kvq_tpu.nn.clip_model import load_clip

    torch.manual_seed(3)
    width, layers, patch, grid, embed = 32, 2, 8, 4, 16
    tw, tl, th, vocab, ctx = 24, 2, 4, 60, 12

    def t(*shape):
        return torch.randn(*shape) * 0.05

    sd = {
        "visual.conv1.weight": t(width, 3, patch, patch),
        "visual.class_embedding": t(width),
        "visual.positional_embedding": t(1 + grid * grid, width),
        "visual.ln_pre.weight": torch.ones(width),
        "visual.ln_pre.bias": torch.zeros(width),
        "visual.ln_post.weight": torch.ones(width),
        "visual.ln_post.bias": torch.zeros(width),
        "visual.proj": t(width, embed),
        "token_embedding.weight": t(vocab, tw),
        "positional_embedding": t(ctx, tw),
        "ln_final.weight": torch.ones(tw),
        "ln_final.bias": torch.zeros(tw),
        "text_projection": t(tw, embed),
        "logit_scale": torch.tensor(2.6593),
    }
    for pre, w, n in (("visual.transformer", width, layers),
                      ("transformer", tw, tl)):
        for i in range(n):
            blk = f"{pre}.resblocks.{i}"
            sd[f"{blk}.attn.in_proj_weight"] = t(3 * w, w)
            sd[f"{blk}.attn.in_proj_bias"] = t(3 * w)
            sd[f"{blk}.attn.out_proj.weight"] = t(w, w)
            sd[f"{blk}.attn.out_proj.bias"] = t(w)
            sd[f"{blk}.ln_1.weight"] = torch.ones(w)
            sd[f"{blk}.ln_1.bias"] = torch.zeros(w)
            sd[f"{blk}.ln_2.weight"] = torch.ones(w)
            sd[f"{blk}.ln_2.bias"] = torch.zeros(w)
            sd[f"{blk}.mlp.c_fc.weight"] = t(4 * w, w)
            sd[f"{blk}.mlp.c_fc.bias"] = t(4 * w)
            sd[f"{blk}.mlp.c_proj.weight"] = t(w, 4 * w)
            sd[f"{blk}.mlp.c_proj.bias"] = t(w)

    path = str(tmp_path / "tiny_clip.pt")
    torch.save(sd, path)

    model, variables = load_clip(path)
    assert model.config.vision_patch_size == patch
    assert model.config.image_resolution == patch * grid
    assert model.config.transformer_layers == tl

    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, patch * grid, patch * grid, 3)),
        jnp.float32,
    )
    txt = jnp.asarray(
        np.random.default_rng(1).integers(1, vocab - 1, size=(3, ctx)),
        jnp.int32,
    )
    li, lt = model.apply(variables, img, txt, train=False)
    assert li.shape == (2, 3)
    assert np.isfinite(np.asarray(li)).all()
