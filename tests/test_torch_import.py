"""Numerics parity: torch reference modules vs our flax modules with
imported weights (random torch init — no network access for pretrained)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from kvq_tpu.core import checkpoint as ckpt
from kvq_tpu.core import torch_import as TI


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
