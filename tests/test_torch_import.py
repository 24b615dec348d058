"""Numerics parity: torch reference modules vs our flax modules with
imported weights (random torch init — no network access for pretrained)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from kvq_tpu.core import checkpoint as ckpt
from kvq_tpu.core import torch_import as TI

pytestmark = pytest.mark.slow  # model-assembly/e2e: minutes on small hosts


def torch_sd_to_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


class TorchBottleneck(torch.nn.Module):
    """Standard torchvision-style Bottleneck, written here as the golden
    model (torchvision is not in this image)."""

    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(
            planes, planes, 3, stride=stride, padding=1, bias=False
        )
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(planes * 4)
        self.relu = torch.nn.ReLU()
        self.downsample = None
        if downsample:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                                bias=False),
                torch.nn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


def test_resnet_stage_parity_with_torch():
    """One full torch ResNet stage (2 bottlenecks, stride 2) vs our trunk
    stage with imported weights — eval mode, running stats."""
    torch.manual_seed(0)
    stage = torch.nn.Sequential(
        TorchBottleneck(64, 32, stride=2, downsample=True),
        TorchBottleneck(128, 32),
    ).eval()
    # randomize BN running stats so the parity is nontrivial
    with torch.no_grad():
        for m in stage.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    sd = {f"layer1.{k}": v for k, v in torch_sd_to_numpy(stage).items()}
    p, s = TI.convert_resnet_trunk(sd, layers=(2,))

    from kvq_tpu.nn.resnet import BottleneckBlock

    x = np.random.default_rng(0).normal(size=(2, 16, 16, 64)).astype(np.float32)

    b0 = BottleneckBlock(planes=32, strides=2, downsample=True,
                         dtype=jnp.float32)
    b1 = BottleneckBlock(planes=32, dtype=jnp.float32)
    v0 = {"params": p["layer1_0"], "batch_stats": s["layer1_0"]}
    v1 = {"params": p["layer1_1"], "batch_stats": s["layer1_1"]}
    h = b0.apply(v0, jnp.asarray(x), train=False)
    ours = b1.apply(v1, h, train=False)

    with torch.no_grad():
        theirs = stage(torch.tensor(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(ours),
        theirs.permute(0, 2, 3, 1).numpy(),
        atol=2e-4,
        rtol=1e-3,
    )


def test_clip_attention_parity():
    """Our CLIPAttention vs torch F.multi_head_attention_forward with the
    same in/out projection weights."""
    from kvq_tpu.nn.clip_vit import CLIPAttention

    C, H, N, B = 64, 4, 10, 2
    rng = np.random.default_rng(1)
    in_w = rng.normal(size=(3 * C, C)).astype(np.float32) * 0.05
    in_b = rng.normal(size=(3 * C,)).astype(np.float32) * 0.05
    out_w = rng.normal(size=(C, C)).astype(np.float32) * 0.05
    out_b = rng.normal(size=(C,)).astype(np.float32) * 0.05
    x = rng.normal(size=(B, N, C)).astype(np.float32)

    attn = CLIPAttention(num_heads=H, dtype=jnp.float32)
    params = {
        "params": {
            "in_proj": {"kernel": in_w.T, "bias": in_b},
            "out_proj": {"kernel": out_w.T, "bias": out_b},
        }
    }
    ours = np.asarray(attn.apply(params, jnp.asarray(x)))

    with torch.no_grad():
        tx = torch.tensor(x).transpose(0, 1)  # (N, B, C)
        theirs, _ = torch.nn.functional.multi_head_attention_forward(
            tx, tx, tx, C, H,
            torch.tensor(in_w), torch.tensor(in_b),
            None, None, False, 0.0,
            torch.tensor(out_w), torch.tensor(out_b),
        )
        theirs = theirs.transpose(0, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_swin_import_forks_fragment_tables():
    """LSVQ-style checkpoints have no fragment tables; the converter must
    clone the relative tables into them (swin_backbone.py:945-952)."""
    depths = (1, 1)
    sd = {}
    C = 24
    table = (2 * 2 - 1) * (2 * 7 - 1) * (2 * 7 - 1)
    rng = np.random.default_rng(0)
    sd["patch_embed.proj.weight"] = rng.normal(size=(C, 3, 2, 4, 4)).astype(np.float32)
    sd["patch_embed.proj.bias"] = np.zeros(C, np.float32)
    sd["patch_embed.norm.weight"] = np.ones(C, np.float32)
    sd["patch_embed.norm.bias"] = np.zeros(C, np.float32)
    for li in range(2):
        dim = C * 2**li
        heads = 2
        b = f"layers.{li}.blocks.0"
        sd[f"{b}.norm1.weight"] = np.ones(dim, np.float32)
        sd[f"{b}.norm1.bias"] = np.zeros(dim, np.float32)
        sd[f"{b}.norm2.weight"] = np.ones(dim, np.float32)
        sd[f"{b}.norm2.bias"] = np.zeros(dim, np.float32)
        sd[f"{b}.attn.qkv.weight"] = rng.normal(size=(3 * dim, dim)).astype(np.float32)
        sd[f"{b}.attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
        sd[f"{b}.attn.proj.weight"] = rng.normal(size=(dim, dim)).astype(np.float32)
        sd[f"{b}.attn.proj.bias"] = np.zeros(dim, np.float32)
        sd[f"{b}.attn.relative_position_bias_table"] = rng.normal(
            size=(table, heads)
        ).astype(np.float32)
        sd[f"{b}.mlp.fc1.weight"] = rng.normal(size=(4 * dim, dim)).astype(np.float32)
        sd[f"{b}.mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
        sd[f"{b}.mlp.fc2.weight"] = rng.normal(size=(dim, 4 * dim)).astype(np.float32)
        sd[f"{b}.mlp.fc2.bias"] = np.zeros(dim, np.float32)
    sd["layers.0.downsample.reduction.weight"] = rng.normal(
        size=(2 * C, 4 * C)
    ).astype(np.float32)
    sd["layers.0.downsample.norm.weight"] = np.ones(4 * C, np.float32)
    sd["layers.0.downsample.norm.bias"] = np.zeros(4 * C, np.float32)
    sd["norm.weight"] = np.ones(2 * C, np.float32)
    sd["norm.bias"] = np.zeros(2 * C, np.float32)

    p = TI.convert_swin3d(sd, depths=depths, frag_biases=(True, False))
    blk = p["trunk"]["layers_0"]["blocks_0"]["attn"]
    np.testing.assert_array_equal(
        blk["fragment_position_bias_table"],
        blk["relative_position_bias_table"],
    )
    assert (
        "fragment_position_bias_table"
        not in p["trunk"]["layers_1"]["blocks_0"]["attn"]
    )

    # and it merges cleanly onto a real model tree
    from kvq_tpu.nn import swin as S

    cfg = S.SwinConfig(
        embed_dim=C, depths=depths, num_heads=(2, 2), window_size=(2, 7, 7),
        frag_biases=(True, False), jump_attention=(False, False),
        use_checkpoint=False,
    )
    model = S.SwinTransformer3D(config=cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 4, 28, 28, 3))
    init = model.init(jax.random.key(0), {"technical": x}, train=False)
    merged, report = ckpt.merge_params(init["params"], p)
    assert not report["missing"], report["missing"][:8]
    assert not report["mismatched"], report["mismatched"][:8]
    out = model.apply({"params": merged}, {"technical": x}, train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_contrique_import_structure():
    # encoder mirroring Sequential(*resnet50.children()[:-2]) positional
    # layout (positions 0..7), but with 1 block per stage for speed
    def stage(inp, planes, stride):
        return torch.nn.Sequential(
            TorchBottleneck(inp, planes, stride=stride, downsample=True)
        )

    enc = torch.nn.Sequential(
        torch.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),  # 0
        torch.nn.BatchNorm2d(64),                                    # 1
        torch.nn.ReLU(),                                             # 2
        torch.nn.MaxPool2d(3, 2, 1),                                 # 3
        stage(64, 64, 1),                                            # 4
        stage(256, 128, 2),                                          # 5
        stage(512, 256, 2),                                          # 6
        stage(1024, 512, 2),                                         # 7
    )
    proj = torch.nn.Sequential(
        torch.nn.Linear(2048, 2048, bias=False),
        torch.nn.BatchNorm1d(2048),
        torch.nn.ReLU(),
        torch.nn.Linear(2048, 128, bias=False),
        torch.nn.BatchNorm1d(128),
    )

    class M(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = enc
            self.projector = proj

    sd = torch_sd_to_numpy(M())
    p, s = TI.convert_contrique(sd, layers=(1, 1, 1, 1))

    from kvq_tpu.nn.contrique import CONTRIQUE

    model = CONTRIQUE(layers=(1, 1, 1, 1), dtype=jnp.float32)
    x = jnp.zeros((1, 2, 64, 64, 3))
    init = model.init(jax.random.key(0), x)
    mp, rp = ckpt.merge_params(init["params"], p)
    ms, rs = ckpt.merge_params(init["batch_stats"], s)
    assert not rp["missing"], rp["missing"][:8]
    assert not rp["mismatched"], rp["mismatched"][:8]
    out = model.apply({"params": mp, "batch_stats": ms}, x)
    assert out.shape == (1, 2, 4, 128)


def test_ksvqe_full_checkpoint_conversion_covers_every_param():
    """Build a reference-named state dict for a tiny KSVQE (inverse of the
    converter's name map), convert it, and require every leaf of the flax
    init tree to be produced with the right shape — so a real
    VQA_Network .pth maps onto VQANetwork with no silent gaps."""
    import jax
    import jax.numpy as jnp

    from kvq_tpu.nn.ksvqe import KSVQE, KSVQEConfig

    cfg = KSVQEConfig(
        num_samples=1,
        tuning_stage=1,
        anchor_size=8,
        region_k=9,
        embed_dim=16,
        depths=(1, 1),
        num_heads=(2, 2),
        window_size=(2, 7, 7),
        use_checkpoint=False,
        contrique_layers=(1, 1, 1, 1),
        clip_layers=2,
        clip_location=1,
        cls_use=True,
        clip_width=64,
        clip_heads=4,
    )
    model = KSVQE(config=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    batch = {
        "fragment": jnp.asarray(rng.normal(size=(1, 8, 40, 40, 3)), jnp.float32),
        "resize_video": jnp.asarray(rng.normal(size=(1, 8, 32, 32, 3)), jnp.float32),
        "dis_label": jnp.zeros((1,), jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.key(0), "qrs": jax.random.key(1)}, batch,
        train=False,
    )

    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                out.update(flatten(v, path))
            else:
                out[path] = np.asarray(v)
        return out

    flat_p = flatten(variables["params"])
    flat_s = flatten(variables.get("batch_stats", {}))

    def torch_key(path, leaf, collection):
        """Inverse of convert_ksvqe_backbone's name map (tiny subset)."""
        import re

        t = path
        # contrique projector / encoder positional names first
        t = t.replace("projector_fc1", "projector.0")
        t = t.replace("projector_bn1", "projector.1")
        t = t.replace("projector_fc2", "projector.3")
        t = t.replace("projector_bn2", "projector.4")
        t = t.replace("encoder/stem/conv1", "encoder.0")
        t = t.replace("encoder/stem/bn1", "encoder.1")
        t = re.sub(r"encoder/layer(\d)_(\d+)",
                   lambda m: f"encoder.{int(m.group(1)) + 3}.{m.group(2)}", t)
        # flax list-index suffixes -> torch ModuleList dots
        for pre in ("layers", "blocks", "resblocks", "adapter_layer",
                    "semantic_adapter", "distortion_adapter",
                    "semantic_cross", "distortion_cross", "distortion_self",
                    "semantic_mod", "distortion_mod"):
            t = re.sub(rf"\b{pre}_(\d+)", rf"{pre}.\1", t)
        t = t.replace("CLIP_tool/resblocks.", "CLIP_tool/transformer_resblocks.")
        t = t.replace("/", ".")
        t = t.replace("CLIP_tool.", "CLIP_tool.visual.")
        t = t.replace(
            "visual.transformer_resblocks", "visual.transformer.resblocks"
        )
        t = t.replace("CLIP_tool.visual.adapter_layer", "CLIP_tool.adapter_layer")
        t = t.replace(".Dense_0", ".0").replace(".Dense_1", ".2")
        t = t.replace("mlp_c_fc", "mlp.c_fc").replace("mlp_c_proj", "mlp.c_proj")
        t = t.replace(".attn.in_proj", ".attn.in_proj_")
        # the nn.Sequential adapters flatten fc1/fc2 -> indices 0/2
        if "adapter" in t:
            t = t.replace(".fc1.", ".0.").replace(".fc2.", ".2.")
        t = t.replace("to_out.", "to_out.0.")
        t = t.replace("downsample_conv", "downsample.0")
        t = t.replace("downsample_bn", "downsample.1")
        # leaves
        if leaf in ("scale", "kernel"):
            t = t.rsplit(".", 1)[0] + ".weight"
        elif leaf == "mean":
            t = t.rsplit(".", 1)[0] + ".running_mean"
        elif leaf == "var":
            t = t.rsplit(".", 1)[0] + ".running_var"
        t = t.replace(".in_proj_.weight", ".in_proj_weight")
        t = t.replace(".in_proj_.bias", ".in_proj_bias")
        return "KSVQE_backbone." + t

    def torch_value(path, leaf, arr):
        if leaf != "kernel":
            return arr
        if arr.ndim == 2:  # Dense
            return arr.T
        if arr.ndim == 4:  # Conv2d HWIO -> OIHW
            return arr.transpose(3, 2, 0, 1)
        if arr.ndim == 5:  # Conv3d
            return arr.transpose(4, 3, 0, 1, 2)
        return arr

    sd = {}
    for path, arr in {**flat_p, **flat_s}.items():
        leaf = path.rsplit("/", 1)[-1]
        if leaf in ("relative_position_bias_table",
                    "fragment_position_bias_table", "class_embedding",
                    "positional_embedding", "a1", "a2"):
            # tables/embeddings map 1:1 (no leaf rename)
            sd[torch_key(path, leaf, None)] = rng.normal(
                size=arr.shape
            ).astype(np.float32)
            continue
        sd[torch_key(path, leaf, None)] = torch_value(
            path, leaf, rng.normal(size=arr.shape).astype(np.float32)
        )

    # FiLM convs are flax Dense here but Conv2d 1x1 in torch
    for m in range(1):
        for conv in ("conv_gama", "conv_beta"):
            k = f"KSVQE_backbone.semantic_mod.{m}.{conv}.weight"
            if k in sd and sd[k].ndim == 2:
                sd[k] = sd[k][:, :, None, None]  # (out,in,1,1)

    from kvq_tpu.core import torch_import as TI

    p, s = TI.convert_ksvqe_backbone(
        sd,
        depths=cfg.depths,
        frag_biases=cfg.frag_biases[: len(cfg.depths)],
        clip_layers=cfg.clip_layers,
        contrique_layers=cfg.contrique_layers,
    )
    got_p = flatten(p)
    got_s = flatten(s)
    missing = sorted(set(flat_p) - set(got_p))
    assert not missing, f"converter missed params: {missing[:10]}"
    for k, v in flat_p.items():
        assert got_p[k].shape == v.shape, (k, got_p[k].shape, v.shape)
    missing_s = sorted(set(flat_s) - set(got_s))
    assert not missing_s, f"converter missed stats: {missing_s[:10]}"


def test_vqa_head_conversion():
    from kvq_tpu.core import torch_import as TI

    rng = np.random.default_rng(0)
    sd = {
        "KSVQE_head.fc_hid.weight": rng.normal(size=(64, 768, 1, 1, 1)).astype(np.float32),
        "KSVQE_head.fc_hid.bias": rng.normal(size=(64,)).astype(np.float32),
        "KSVQE_head.fc_last.weight": rng.normal(size=(1, 64, 1, 1, 1)).astype(np.float32),
        "KSVQE_head.fc_last.bias": rng.normal(size=(1,)).astype(np.float32),
    }
    p = TI.convert_vqa_head(sd)
    assert p["fc_hid"]["kernel"].shape == (768, 64)
    np.testing.assert_allclose(
        p["fc_hid"]["kernel"],
        sd["KSVQE_head.fc_hid.weight"].reshape(64, 768).T,
    )
    assert p["fc_last"]["kernel"].shape == (64, 1)


def _fake_timm_swin2d_sd(embed_dim, depths, heads, entry_style):
    """Synthesize a timm swin_tiny-style state dict (tiny geometry).

    ``entry_style=True`` uses timm>=0.9 naming (downsample attached to the
    entry of stage i); False uses the original/0.6 naming (exit of stage
    i-1) — convert_swin2d must accept both.
    """
    rng = np.random.default_rng(3)
    f32 = lambda *s: rng.normal(size=s).astype(np.float32)  # noqa: E731
    sd = {
        "patch_embed.proj.weight": f32(embed_dim, 3, 4, 4),
        "patch_embed.proj.bias": f32(embed_dim),
        "patch_embed.norm.weight": f32(embed_dim),
        "patch_embed.norm.bias": f32(embed_dim),
        "norm.weight": f32(embed_dim * 2 ** (len(depths) - 1)),
        "norm.bias": f32(embed_dim * 2 ** (len(depths) - 1)),
        "head.weight": f32(10, embed_dim * 2 ** (len(depths) - 1)),
        "head.bias": f32(10),
    }
    for li, depth in enumerate(depths):
        C = embed_dim * 2**li
        for b in range(depth):
            pre = f"layers.{li}.blocks.{b}"
            sd[f"{pre}.norm1.weight"] = f32(C)
            sd[f"{pre}.norm1.bias"] = f32(C)
            sd[f"{pre}.attn.qkv.weight"] = f32(3 * C, C)
            sd[f"{pre}.attn.qkv.bias"] = f32(3 * C)
            sd[f"{pre}.attn.proj.weight"] = f32(C, C)
            sd[f"{pre}.attn.proj.bias"] = f32(C)
            sd[f"{pre}.attn.relative_position_bias_table"] = f32(
                169, heads[li]
            )
            sd[f"{pre}.attn.relative_position_index"] = np.zeros(
                (49, 49), np.int64
            )
            sd[f"{pre}.norm2.weight"] = f32(C)
            sd[f"{pre}.norm2.bias"] = f32(C)
            sd[f"{pre}.mlp.fc1.weight"] = f32(4 * C, C)
            sd[f"{pre}.mlp.fc1.bias"] = f32(4 * C)
            sd[f"{pre}.mlp.fc2.weight"] = f32(C, 4 * C)
            sd[f"{pre}.mlp.fc2.bias"] = f32(C)
        if li < len(depths) - 1:
            ds = (f"layers.{li + 1}.downsample" if entry_style
                  else f"layers.{li}.downsample")
            sd[f"{ds}.reduction.weight"] = f32(2 * C, 4 * C)
            sd[f"{ds}.norm.weight"] = f32(4 * C)
            sd[f"{ds}.norm.bias"] = f32(4 * C)
    return sd


@pytest.mark.parametrize("entry_style", [False, True])
def test_swin2d_timm_conversion_covers_every_param(entry_style):
    """convert_swin2d maps a timm-named 2D swin state dict (either timm
    generation) onto swin_2d_tiny with no missing or misshaped leaves."""
    import jax
    import jax.numpy as jnp

    from kvq_tpu.core import torch_import as TI
    from kvq_tpu.nn.swin import swin_2d_tiny

    depths, heads = (1, 1), (2, 4)
    model = swin_2d_tiny(
        embed_dim=8, depths=depths, num_heads=heads, use_checkpoint=False
    )
    x = {
        "technical": jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 2, 56, 56, 3)),
            jnp.float32,
        )
    }
    variables = model.init(jax.random.key(0), x, train=False)

    sd = _fake_timm_swin2d_sd(8, depths, heads, entry_style)
    p = TI.convert_swin2d(sd, depths=depths)

    flat_ref = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_conv = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(p)
    )
    missing = []
    for k, v in flat_ref:
        ks = jax.tree_util.keystr(k)
        got = flat_conv.pop(ks, None)
        if got is None or got.shape != v.shape:
            missing.append((ks, None if got is None else got.shape, v.shape))
    assert not missing, f"missing/misshaped: {missing[:8]}"
    assert not flat_conv, f"extra converted leaves: {list(flat_conv)[:8]}"

    # converted weights actually load
    out = model.apply({"params": p}, x, train=False)
    assert np.isfinite(np.asarray(out)).all()
