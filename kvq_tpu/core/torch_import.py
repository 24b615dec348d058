"""Torch checkpoint importers.

The reference stack loads several frozen torch checkpoints (SURVEY.md §5
Checkpoint/resume): ImageNet ResNet-50 (simpleVQA_model.py:318-324), CLIP
ViT-B/16 (clip/clip.py:39-86), CONTRIQUE tar (KSVQE_model.py:1078), and
LSVQ-pretrained Video-Swin with relative->fragment bias-table forking
(swin_backbone.py:933-1006).  These converters map torch state dicts onto
this package's param trees:

  - conv weights  OIHW  -> HWIO   (O,I,kh,kw   -> kh,kw,I,O)
  - conv3d        OIDHW -> DHWIO
  - linear        (out,in)        -> (in,out)
  - batchnorm     weight/bias     -> scale/bias;  running stats -> batch_stats
  - layernorm     weight/bias     -> scale/bias

All converters consume a flat ``{torch_key: np.ndarray}`` dict (use
:func:`load_torch_state_dict` on a .pth/.tar) and return nested
params/batch_stats trees mergeable via checkpoint.merge_params.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "network"):
        if isinstance(obj, dict) and key in obj:
            obj = obj[key]
            break
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k.replace("module.", "")] = v.detach().cpu().numpy()
    return out


def conv2d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def conv3d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: dict, path: str, value) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


def _bn(params: dict, stats: dict, dst: str, sd: Mapping, src: str) -> None:
    _set(params, f"{dst}/scale", sd[f"{src}.weight"])
    _set(params, f"{dst}/bias", sd[f"{src}.bias"])
    _set(stats, f"{dst}/mean", sd[f"{src}.running_mean"])
    _set(stats, f"{dst}/var", sd[f"{src}.running_var"])


def _ln(params: dict, dst: str, sd: Mapping, src: str) -> None:
    _set(params, f"{dst}/scale", sd[f"{src}.weight"])
    _set(params, f"{dst}/bias", sd[f"{src}.bias"])


# --------------------------------------------------------------------------
# ResNet (torchvision naming) -> ResNetTrunk


def convert_resnet_trunk(
    sd: Mapping[str, np.ndarray],
    prefix: str = "",
    layers: tuple[int, ...] = (3, 4, 6, 3),
) -> tuple[dict, dict]:
    """torchvision resnet -> {stem, layer{i}_{b}} trunk params/stats."""
    p: dict = {}
    s: dict = {}
    if prefix + "conv1.weight" in sd:
        _set(p, "stem/conv1/kernel", conv2d(sd[prefix + "conv1.weight"]))
        _bn(p, s, "stem/bn1", sd, prefix + "bn1")
    for li, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            src = f"{prefix}layer{li + 1}.{b}"
            dst = f"layer{li + 1}_{b}"
            for ci in (1, 2, 3):
                ck = f"{src}.conv{ci}.weight"
                if ck not in sd:
                    continue  # BasicBlock has only conv1/conv2
                _set(p, f"{dst}/conv{ci}/kernel", conv2d(sd[ck]))
                _bn(p, s, f"{dst}/bn{ci}", sd, f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                _set(
                    p,
                    f"{dst}/downsample_conv/kernel",
                    conv2d(sd[f"{src}.downsample.0.weight"]),
                )
                _bn(p, s, f"{dst}/downsample_bn", sd, f"{src}.downsample.1")
    return p, s


def convert_simplevqa_resnet50(sd: Mapping[str, np.ndarray]) -> tuple[dict, dict]:
    """ImageNet resnet50 -> FeatureResNet ('trunk' submodule)."""
    p, s = convert_resnet_trunk(sd)
    return {"trunk": p}, {"trunk": s}


# --------------------------------------------------------------------------
# CLIP ViT visual tower -> CLIPVisionTower


def convert_clip_visual(
    sd: Mapping[str, np.ndarray], n_layers: int = 12, prefix: str = "visual."
) -> dict:
    p: dict = {}
    _set(p, "conv1/kernel", conv2d(sd[prefix + "conv1.weight"]))
    _set(p, "class_embedding", sd[prefix + "class_embedding"])
    _set(p, "positional_embedding", sd[prefix + "positional_embedding"])
    _ln(p, "ln_pre", sd, prefix + "ln_pre")
    for i in range(n_layers):
        src = f"{prefix}transformer.resblocks.{i}"
        dst = f"resblocks_{i}"
        _set(p, f"{dst}/attn/in_proj/kernel", linear(sd[f"{src}.attn.in_proj_weight"]))
        _set(p, f"{dst}/attn/in_proj/bias", sd[f"{src}.attn.in_proj_bias"])
        _set(
            p,
            f"{dst}/attn/out_proj/kernel",
            linear(sd[f"{src}.attn.out_proj.weight"]),
        )
        _set(p, f"{dst}/attn/out_proj/bias", sd[f"{src}.attn.out_proj.bias"])
        _ln(p, f"{dst}/ln_1", sd, f"{src}.ln_1")
        _ln(p, f"{dst}/ln_2", sd, f"{src}.ln_2")
        _set(p, f"{dst}/mlp_c_fc/kernel", linear(sd[f"{src}.mlp.c_fc.weight"]))
        _set(p, f"{dst}/mlp_c_fc/bias", sd[f"{src}.mlp.c_fc.bias"])
        _set(p, f"{dst}/mlp_c_proj/kernel", linear(sd[f"{src}.mlp.c_proj.weight"]))
        _set(p, f"{dst}/mlp_c_proj/bias", sd[f"{src}.mlp.c_proj.bias"])
    return p


# --------------------------------------------------------------------------
# CONTRIQUE (resnet50 encoder as Sequential + projector)


def convert_contrique(
    sd: Mapping[str, np.ndarray], layers: tuple[int, ...] = (3, 4, 6, 3)
) -> tuple[dict, dict]:
    """CONTRIQUE_model state dict -> CONTRIQUE module params/stats.

    The torch encoder is ``Sequential(*resnet50.children()[:-2])`` so keys
    are positional: 0=conv1, 1=bn1, 4..7=layer1..4 (KSVQE_model.py:1634)."""
    remapped: dict[str, np.ndarray] = {}
    pos_to_name = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
                   "6": "layer3", "7": "layer4"}
    for k, v in sd.items():
        if k.startswith("encoder."):
            rest = k[len("encoder."):]
            pos, _, tail = rest.partition(".")
            if pos in pos_to_name:
                name = pos_to_name[pos]
                remapped[f"{name}.{tail}" if tail else name] = v
    enc_p, enc_s = convert_resnet_trunk(remapped, layers=layers)
    p: dict = {"encoder": enc_p}
    s: dict = {"encoder": enc_s}
    _set(p, "projector_fc1/kernel", linear(sd["projector.0.weight"]))
    _bn(p, s, "projector_bn1", sd, "projector.1")
    _set(p, "projector_fc2/kernel", linear(sd["projector.3.weight"]))
    _bn(p, s, "projector_bn2", sd, "projector.4")
    return p, s


# --------------------------------------------------------------------------
# Video Swin 3D


def convert_swin3d(
    sd: Mapping[str, np.ndarray],
    depths: tuple[int, ...] = (2, 2, 6, 2),
    frag_biases: tuple[bool, ...] = (True, True, True, False),
    prefix: str = "",
    trunk_key: str | None = "trunk",
) -> dict:
    """Video-Swin torch keys -> SwinTransformer3D / KSVQE trunk params.

    Reproduces the reference LSVQ loader's table forking: when a stage
    wants a fragment bias table but the checkpoint has none, the relative
    table is cloned into it (swin_backbone.py:945-952)."""
    p: dict = {}
    tp: dict = {}  # trunk (stages) subtree
    g = lambda k: sd[prefix + k]  # noqa: E731
    _set(p, "patch_embed/proj/kernel", conv3d(g("patch_embed.proj.weight")))
    _set(p, "patch_embed/proj/bias", g("patch_embed.proj.bias"))
    if prefix + "patch_embed.norm.weight" in sd:
        _ln(p, "patch_embed/norm", sd, prefix + "patch_embed.norm")
    for li, depth in enumerate(depths):
        for b in range(depth):
            src = f"{prefix}layers.{li}.blocks.{b}"
            dst = f"layers_{li}/blocks_{b}"
            _ln(tp, f"{dst}/norm1", sd, f"{src}.norm1")
            _ln(tp, f"{dst}/norm2", sd, f"{src}.norm2")
            _set(tp, f"{dst}/attn/qkv/kernel", linear(sd[f"{src}.attn.qkv.weight"]))
            if f"{src}.attn.qkv.bias" in sd:
                _set(tp, f"{dst}/attn/qkv/bias", sd[f"{src}.attn.qkv.bias"])
            _set(tp, f"{dst}/attn/proj/kernel", linear(sd[f"{src}.attn.proj.weight"]))
            _set(tp, f"{dst}/attn/proj/bias", sd[f"{src}.attn.proj.bias"])
            rel = sd[f"{src}.attn.relative_position_bias_table"]
            _set(tp, f"{dst}/attn/relative_position_bias_table", rel)
            if frag_biases[li]:
                frag_key = f"{src}.attn.fragment_position_bias_table"
                frag = sd.get(frag_key, rel)  # fork when absent
                _set(tp, f"{dst}/attn/fragment_position_bias_table", frag)
            _set(tp, f"{dst}/mlp/fc1/kernel", linear(sd[f"{src}.mlp.fc1.weight"]))
            _set(tp, f"{dst}/mlp/fc1/bias", sd[f"{src}.mlp.fc1.bias"])
            _set(tp, f"{dst}/mlp/fc2/kernel", linear(sd[f"{src}.mlp.fc2.weight"]))
            _set(tp, f"{dst}/mlp/fc2/bias", sd[f"{src}.mlp.fc2.bias"])
        if f"{prefix}layers.{li}.downsample.reduction.weight" in sd:
            _set(
                tp,
                f"layers_{li}/downsample/reduction/kernel",
                linear(sd[f"{prefix}layers.{li}.downsample.reduction.weight"]),
            )
            _ln(
                tp,
                f"layers_{li}/downsample/norm",
                sd,
                f"{prefix}layers.{li}.downsample.norm",
            )
    if prefix + "norm.weight" in sd:
        _ln(p, "norm", sd, prefix + "norm")
    if trunk_key:
        p[trunk_key] = tp
    else:
        p.update(tp)
    return p


# --------------------------------------------------------------------------
# Full CLIP (text encoder + either visual tower) -> kvq_tpu.nn.clip_model.CLIP


def _convert_attn_blocks(
    p: dict, sd: Mapping[str, np.ndarray], src_prefix: str, dst_prefix: str,
    n_layers: int,
) -> None:
    """torch nn.MultiheadAttention resblocks -> ResidualAttentionBlock tree
    (shared by the visual and text transformers, clip/model.py:178-250)."""
    for i in range(n_layers):
        src = f"{src_prefix}.{i}"
        dst = f"{dst_prefix}resblocks_{i}"
        _set(p, f"{dst}/attn/in_proj/kernel", linear(sd[f"{src}.attn.in_proj_weight"]))
        _set(p, f"{dst}/attn/in_proj/bias", sd[f"{src}.attn.in_proj_bias"])
        _set(p, f"{dst}/attn/out_proj/kernel", linear(sd[f"{src}.attn.out_proj.weight"]))
        _set(p, f"{dst}/attn/out_proj/bias", sd[f"{src}.attn.out_proj.bias"])
        _ln(p, f"{dst}/ln_1", sd, f"{src}.ln_1")
        _ln(p, f"{dst}/ln_2", sd, f"{src}.ln_2")
        _set(p, f"{dst}/mlp_c_fc/kernel", linear(sd[f"{src}.mlp.c_fc.weight"]))
        _set(p, f"{dst}/mlp_c_fc/bias", sd[f"{src}.mlp.c_fc.bias"])
        _set(p, f"{dst}/mlp_c_proj/kernel", linear(sd[f"{src}.mlp.c_proj.weight"]))
        _set(p, f"{dst}/mlp_c_proj/bias", sd[f"{src}.mlp.c_proj.bias"])


def convert_clip_full(sd: Mapping[str, np.ndarray]) -> tuple[dict, dict]:
    """OpenAI CLIP state_dict -> (params, batch_stats) for
    :class:`kvq_tpu.nn.clip_model.CLIP` — the counterpart of the reference's
    shape-inferred ``build_model`` loader (clip/model.py:455-482)."""
    from ..nn.clip_model import clip_config_from_state_dict

    cfg = clip_config_from_state_dict(sd)
    p: dict = {}
    s: dict = {}
    if isinstance(cfg.vision_layers, tuple):  # ModifiedResNet tower
        for ci in (1, 2, 3):
            _set(
                p,
                f"visual/stem_conv{ci}/kernel",
                conv2d(sd[f"visual.conv{ci}.weight"]),
            )
            _bn(p, s, f"visual/stem_bn{ci}", sd, f"visual.bn{ci}")
        for li, n_blocks in enumerate(cfg.vision_layers):
            for b in range(n_blocks):
                src = f"visual.layer{li + 1}.{b}"
                dst = f"visual/layer{li + 1}_{b}"
                for ci in (1, 2, 3):
                    _set(
                        p,
                        f"{dst}/conv{ci}/kernel",
                        conv2d(sd[f"{src}.conv{ci}.weight"]),
                    )
                    _bn(p, s, f"{dst}/bn{ci}", sd, f"{src}.bn{ci}")
                if f"{src}.downsample.0.weight" in sd:
                    _set(
                        p,
                        f"{dst}/downsample_conv/kernel",
                        conv2d(sd[f"{src}.downsample.0.weight"]),
                    )
                    _bn(p, s, f"{dst}/downsample_bn", sd, f"{src}.downsample.1")
        ap = "visual/attnpool"
        _set(p, f"{ap}/positional_embedding", sd["visual.attnpool.positional_embedding"])
        for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
            _set(p, f"{ap}/{proj}/kernel", linear(sd[f"visual.attnpool.{proj}.weight"]))
            _set(p, f"{ap}/{proj}/bias", sd[f"visual.attnpool.{proj}.bias"])
    else:  # ViT tower
        p["visual"] = convert_clip_visual(sd, n_layers=cfg.vision_layers)
        _ln(p, "visual_ln_post", sd, "visual.ln_post")
        _set(p, "visual_proj", sd["visual.proj"])
    # text encoder
    _set(p, "text/token_embedding", sd["token_embedding.weight"])
    _set(p, "text/positional_embedding", sd["positional_embedding"])
    _convert_attn_blocks(
        p, sd, "transformer.resblocks", "text/", cfg.transformer_layers
    )
    _ln(p, "text/ln_final", sd, "ln_final")
    _set(p, "text/text_projection", sd["text_projection"])
    _set(p, "logit_scale", sd["logit_scale"])
    return p, s
