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
    # model_state: pytorchvideo model-zoo .pyth files (e.g. SLOWFAST_8x8_R50)
    for key in ("state_dict", "model_state", "model", "network"):
        if isinstance(obj, dict) and key in obj:
            obj = obj[key]
            break
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            if k.startswith("module."):  # DDP prefix (trainer_ddp.py:74-77)
                k = k[len("module."):]
            out[k] = v.detach().cpu().numpy()
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
    extra = f"{prefix}transformer.resblocks.{n_layers}.ln_1.weight"
    if extra in sd:
        raise ValueError(
            f"checkpoint has more than {n_layers} visual resblocks "
            "(deeper CLIP variant?) — pass the tower's true depth via "
            "n_layers/--clip_layers instead of silently truncating"
        )
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


def convert_swin2d(
    sd: Mapping[str, np.ndarray],
    depths: tuple[int, ...] = (2, 2, 6, 2),
) -> dict:
    """timm ``swin_tiny_patch4_window7_224`` state_dict -> ``swin_2d_tiny``
    params.

    The reference's SwinTransformer2D is the timm trunk with the classifier
    stripped (swin_backbone.py:1098-1103).  Our 2D model is
    SwinTransformer3D specialized to depth-1 windows (nn/swin.py
    ``swin_2d_tiny``), whose (1, 13, 13)-flattened relative-position table
    coincides exactly with timm's 2D (13, 13) table, and whose
    PatchMerging concat order matches timm's across both timm generations
    — so the 3D converter applies after two normalizations:

    * the 2D patch kernel (C, 3, 4, 4) gains a singleton time axis;
    * timm >= 0.9 attaches the downsample to the *entry* of stage ``i``;
      the original / video-Swin convention (and ours) is the *exit* of
      stage ``i - 1`` — shift the key when the new naming is detected.

    Classifier (``head.*``) and buffer keys are dropped (the reference
    strips them too).
    """
    import re

    entry_style = (
        "layers.0.downsample.reduction.weight" not in sd
        and any(".downsample." in k for k in sd)
    )
    sd2: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if (
            k.startswith("head.")
            or k.endswith("relative_position_index")
            or k.endswith("attn_mask")
        ):
            continue
        if entry_style:
            m = re.match(r"layers\.(\d+)\.downsample\.(.*)", k)
            if m:
                k = f"layers.{int(m.group(1)) - 1}.downsample.{m.group(2)}"
        sd2[k] = np.asarray(v)
    w = sd2["patch_embed.proj.weight"]
    if w.ndim == 4:  # (C_out, 3, 4, 4) -> (C_out, 3, 1, 4, 4)
        sd2["patch_embed.proj.weight"] = w[:, :, None]
    return convert_swin3d(
        sd2, depths=depths, frag_biases=(False,) * len(depths),
        trunk_key="trunk",
    )


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


# --------------------------------------------------------------------------
# Full KSVQE (VQA_Network checkpoint) -> kvq_tpu KSVQE + VQAHead


def strip_module_prefix(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Drop DDP's 'module.' prefix (reference trainer_ddp.py:74-77)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def conv1x1_to_dense(w: np.ndarray) -> np.ndarray:
    """1x1(x1) ConvNd weight (out, in, 1...) -> Dense kernel (in, out)."""
    return w.reshape(w.shape[0], w.shape[1]).T


def _adapter(p: dict, dst: str, sd: Mapping, src: str,
             names: tuple[str, str] = ("fc1", "fc2")) -> None:
    """nn.Sequential(Linear, ReLU, Linear, ReLU) -> two named Denses."""
    _set(p, f"{dst}/{names[0]}/kernel", linear(sd[f"{src}.0.weight"]))
    _set(p, f"{dst}/{names[0]}/bias", sd[f"{src}.0.bias"])
    _set(p, f"{dst}/{names[1]}/kernel", linear(sd[f"{src}.2.weight"]))
    _set(p, f"{dst}/{names[1]}/bias", sd[f"{src}.2.bias"])


def convert_vqa_head(
    sd: Mapping[str, np.ndarray], prefix: str = "KSVQE_head."
) -> dict:
    """VQAHead Conv3d 1x1x1 weights (head.py:55-56) -> Dense params."""
    p: dict = {}
    _set(p, "fc_hid/kernel", conv1x1_to_dense(sd[prefix + "fc_hid.weight"]))
    _set(p, "fc_hid/bias", sd[prefix + "fc_hid.bias"])
    _set(p, "fc_last/kernel", conv1x1_to_dense(sd[prefix + "fc_last.weight"]))
    _set(p, "fc_last/bias", sd[prefix + "fc_last.bias"])
    return p


def convert_ksvqe_backbone(
    sd: Mapping[str, np.ndarray],
    prefix: str = "KSVQE_backbone.",
    depths: tuple[int, ...] = (2, 2, 6, 2),
    frag_biases: tuple[bool, ...] = (True, True, True, False),
    clip_layers: int = 12,
    contrique_layers: tuple[int, ...] = (3, 4, 6, 3),
) -> tuple[dict, dict]:
    """Reference KSVQE module (KSVQE_model.py:1024-1350) -> params/stats.

    Covers the trunk (patch_embed + 4 Swin stages + final norm), the CLIP
    tool with cls adapters, CONTRIQUE + projector (BN running stats in the
    stats tree), dist_adapter, and every CDM module list
    (semantic/distortion adapters, cross attentions, temporal
    self-attention, FiLM transforms, a1/a2)."""
    bk = prefix
    p = convert_swin3d(
        sd, depths=depths, frag_biases=frag_biases, prefix=bk, trunk_key=None
    )
    s: dict = {}

    # CLIP tool: visual tower + residual cls adapters
    clip_p = convert_clip_visual(
        sd, n_layers=clip_layers, prefix=f"{bk}CLIP_tool.visual."
    )
    i = 0
    while f"{bk}CLIP_tool.adapter_layer.{i}.0.weight" in sd:
        _adapter(
            clip_p,
            f"adapter_layer_{i}",
            sd,
            f"{bk}CLIP_tool.adapter_layer.{i}",
        )
        i += 1
    p["CLIP_tool"] = clip_p

    # CONTRIQUE distortion tool (same layout as the standalone tar)
    dt_prefix = f"{bk}distortion_tool."
    dt_sd = {
        k[len(dt_prefix):]: v for k, v in sd.items() if k.startswith(dt_prefix)
    }
    dp, ds = convert_contrique(dt_sd, layers=contrique_layers)
    p["distortion_tool"] = dp
    s["distortion_tool"] = ds

    _adapter(p, "dist_adapter", sd, f"{bk}dist_adapter")

    # CDM module lists (one entry per stage >= tuning_stage)
    m = 0
    while f"{bk}semantic_adapter.{m}.0.weight" in sd:
        _adapter(p, f"semantic_adapter_{m}", sd, f"{bk}semantic_adapter.{m}")
        _adapter(p, f"distortion_adapter_{m}", sd, f"{bk}distortion_adapter.{m}")
        for which in ("semantic_cross", "distortion_cross"):
            for fc in ("fc_q", "fc_k", "fc_v"):
                src = f"{bk}{which}.{m}.{fc}"
                _set(p, f"{which}_{m}/{fc}/kernel", linear(sd[f"{src}.weight"]))
                _set(p, f"{which}_{m}/{fc}/bias", sd[f"{src}.bias"])
        _set(
            p,
            f"distortion_self_{m}/to_qkv/kernel",
            linear(sd[f"{bk}distortion_self.{m}.to_qkv.weight"]),
        )
        _set(
            p,
            f"distortion_self_{m}/to_out/kernel",
            linear(sd[f"{bk}distortion_self.{m}.to_out.0.weight"]),
        )
        _set(
            p,
            f"distortion_self_{m}/to_out/bias",
            sd[f"{bk}distortion_self.{m}.to_out.0.bias"],
        )
        for conv in ("conv_gama", "conv_beta"):
            _set(
                p,
                f"semantic_mod_{m}/{conv}/kernel",
                conv1x1_to_dense(sd[f"{bk}semantic_mod.{m}.{conv}.weight"]),
            )
            _set(
                p,
                f"semantic_mod_{m}/{conv}/bias",
                sd[f"{bk}semantic_mod.{m}.{conv}.bias"],
            )
        for lin in ("get_gamma", "get_beta"):
            _set(
                p,
                f"distortion_mod_{m}/{lin}/kernel",
                linear(sd[f"{bk}distortion_mod.{m}.{lin}.weight"]),
            )
            _set(
                p,
                f"distortion_mod_{m}/{lin}/bias",
                sd[f"{bk}distortion_mod.{m}.{lin}.bias"],
            )
        m += 1

    if f"{bk}a1" in sd:
        p["a1"] = np.asarray(sd[f"{bk}a1"], np.float32)
        p["a2"] = np.asarray(sd[f"{bk}a2"], np.float32)
    return p, s


def convert_ksvqe_full(
    sd: Mapping[str, np.ndarray], **kwargs
) -> tuple[dict, dict]:
    """Full reference VQA_Network checkpoint ('KSVQE_backbone.*' +
    'KSVQE_head.*', optional DDP 'module.' prefix) -> (params, batch_stats)
    trees for :class:`kvq_tpu.models.vqa_network.VQANetwork`."""
    sd = strip_module_prefix(sd)
    bp, bs = convert_ksvqe_backbone(sd, **kwargs)
    params = {"KSVQE_backbone": bp}
    stats = {"KSVQE_backbone": bs}
    if "KSVQE_head.fc_hid.weight" in sd:
        params["KSVQE_head"] = convert_vqa_head(sd)
    return params, stats


def convert_simplevqa_full(sd: Mapping[str, np.ndarray]) -> tuple[dict, dict]:
    """Full reference VQA_Network SimpleVQA checkpoint
    ('simpleVQA_backbone.*' ResNet-50 + 'simpleVQA_head.*' 2-layer MLP) ->
    (params, batch_stats) for VQANetwork.  The backbone's in-model
    ``quality`` head is bypassed by the reference forward
    (simpleVQA_model.py:258-262) and is not converted."""
    sd = strip_module_prefix(sd)
    bp, bs = convert_resnet_trunk(sd, prefix="simpleVQA_backbone.")
    params: dict = {"simpleVQA_backbone": {"trunk": bp}}
    stats: dict = {"simpleVQA_backbone": {"trunk": bs}}
    hk = "simpleVQA_head.quality."
    if hk + "0.weight" in sd:
        hp: dict = {}
        _set(hp, "fc1/kernel", linear(sd[hk + "0.weight"]))
        _set(hp, "fc1/bias", sd[hk + "0.bias"])
        _set(hp, "fc2/kernel", linear(sd[hk + "1.weight"]))
        _set(hp, "fc2/bias", sd[hk + "1.bias"])
        params["simpleVQA_head"] = hp
    return params, stats


# --------------------------------------------------------------------------
# SlowFast-R50 (pytorchvideo naming) -> kvq_tpu.nn.slowfast.SlowFastR50


def convert_slowfast_r50(
    sd: Mapping[str, np.ndarray], layers: tuple[int, ...] = (3, 4, 6, 3)
) -> tuple[dict, dict]:
    """pytorchvideo ``slowfast_r50`` state dict -> SlowFastR50 params/stats.

    Key layout (pytorchvideo create_slowfast; the reference loads this
    model via torch.hub, SlowFast_features.py:137-165): ``blocks.0`` holds
    the two stems + first fusion, ``blocks.1..4`` the four stages (each
    ``multipathway_blocks.{0=slow,1=fast}.res_blocks.{b}`` with
    ``branch2.conv_{a,b,c}`` bottleneck convs and optional
    ``branch1_conv`` projection) + fusions after stages 1-3; the
    classification head (``blocks.5+``) is not used — the reference taps
    pooled pathway features."""
    p: dict = {}
    s: dict = {}

    def bn3d(dst, src):
        _bn(p, s, dst, sd, src)

    for pi, path in ((0, "slow"), (1, "fast")):
        stem = f"blocks.0.multipathway_blocks.{pi}"
        _set(p, f"{path}/stem_conv/kernel", conv3d(sd[f"{stem}.conv.weight"]))
        bn3d(f"{path}/stem_bn", f"{stem}.norm")
        for li, n_blocks in enumerate(layers):
            for b in range(n_blocks):
                src = f"blocks.{li + 1}.multipathway_blocks.{pi}.res_blocks.{b}"
                dst = f"{path}/res{li + 2}_{b}"
                for tc, mc in (("a", "1"), ("b", "2"), ("c", "3")):
                    _set(
                        p,
                        f"{dst}/conv{mc}/kernel",
                        conv3d(sd[f"{src}.branch2.conv_{tc}.weight"]),
                    )
                    bn3d(f"{dst}/bn{mc}", f"{src}.branch2.norm_{tc}")
                if f"{src}.branch1_conv.weight" in sd:
                    _set(
                        p,
                        f"{dst}/downsample_conv/kernel",
                        conv3d(sd[f"{src}.branch1_conv.weight"]),
                    )
                    bn3d(f"{dst}/downsample_bn", f"{src}.branch1_norm")
    for i in range(4):  # fusions: stem + after stages 1..3
        src = f"blocks.{i}.multipathway_fusion"
        if f"{src}.conv_fast_to_slow.weight" not in sd:
            continue
        _set(
            p,
            f"lateral_{i}_conv/kernel",
            conv3d(sd[f"{src}.conv_fast_to_slow.weight"]),
        )
        bn3d(f"lateral_{i}_bn", f"{src}.norm")
    return p, s
