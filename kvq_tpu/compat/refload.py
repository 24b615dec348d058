"""Load the PyTorch reference implementation for numerical parity checks.

The north-star accuracy claim ("SRCC/PLCC within 0.002 of the reference")
reduces to per-video score parity between the reference torch models and
this rebuild under identical weights.  This module makes that comparison
possible in-process: it imports the reference's own model files, builds
its KSVQE / SimpleVQA networks with *seeded random* weights (no
checkpoint downloads), and returns torch modules whose ``state_dict()``
keys are exactly what ``kvq_tpu.core.torch_import.convert_*_full``
expects (``<key>_backbone.* / <key>_head.*``).

The reference cannot be imported as-is on this image:

* ``models/backbones/__init__.py`` instantiates ``SwinTransformer3D`` at
  import time, which ``torch.load``s a checkpoint from a relative path
  (reference ``swin_backbone.py:1108``).  We therefore import the model
  files under a private package name (``kvq_ref``) whose parent packages
  are synthesized shells with ``__path__`` pointing into the reference
  tree — the side-effectful ``__init__`` never runs.
* timm / torchvision / ftfy are not installed here.  Minimal functional
  stand-ins are registered in ``sys.modules`` first.  The pieces that
  affect numerics (``DropPath``, ``trunc_normal_``, ``Normalize``,
  ``torchvision.models.resnet50``) are real implementations; everything
  else raises on use.  ``torchvision.models.resnet50`` maps to the
  reference's *own* torchvision-clone ResNet
  (``simpleVQA_model.py:307``), which keeps CONTRIQUE's encoder
  state-dict keys identical to real torchvision.
* ``KSVQE.__init__`` downloads CLIP ViT-B/16 and loads CONTRIQUE from
  hard-coded absolute paths (reference ``KSVQE_model.py:1072-1078``).
  Those acquisition points are patched to produce seeded random weights,
  which is exactly what a parity check needs.
"""

from __future__ import annotations

import contextlib
import importlib
import io
import sys
import types
from types import SimpleNamespace

import numpy as np

REF_ROOT = "/root/reference"
_PKG = "kvq_ref"


# --------------------------------------------------------------------------
# third-party stand-ins


def _raise_on_use(name):
    def fn(*a, **k):
        raise RuntimeError(f"stub '{name}' must not be called in parity runs")

    return fn


def install_stubs() -> None:
    """Register minimal timm / torchvision / ftfy stand-ins (idempotent)."""
    import torch
    import torch.nn as nn

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(nn.Module):
            """timm stochastic depth: identity in eval, per-sample drop in
            train (only the eval path is exercised by parity runs)."""

            def __init__(self, drop_prob: float = 0.0):
                super().__init__()
                self.drop_prob = float(drop_prob or 0.0)

            def forward(self, x):
                if not self.training or self.drop_prob == 0.0:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = x.new_empty(shape).bernoulli_(keep)
                return x * mask / keep

        layers.DropPath = DropPath
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
        timm_models.layers = layers
        timm.models = timm_models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = layers

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_io = types.ModuleType("torchvision.io")
        tv_io.write_video = _raise_on_use("torchvision.io.write_video")
        tv_io.write_png = _raise_on_use("torchvision.io.write_png")

        tv_tf = types.ModuleType("torchvision.transforms")

        class Normalize:
            """Functional torchvision.transforms.Normalize for (...,C,H,W)."""

            def __init__(self, mean, std, inplace=False):
                self.mean = torch.as_tensor(mean, dtype=torch.float32)
                self.std = torch.as_tensor(std, dtype=torch.float32)

            def __call__(self, x):
                m = self.mean.to(x.device, x.dtype).view(-1, 1, 1)
                s = self.std.to(x.device, x.dtype).view(-1, 1, 1)
                return (x - m) / s

        class _Unused:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                raise RuntimeError("transform stub must not be called")

        class InterpolationMode:
            BICUBIC = "bicubic"
            BILINEAR = "bilinear"
            NEAREST = "nearest"

        tv_tf.Normalize = Normalize
        for nm in ("Compose", "Resize", "CenterCrop", "ToTensor",
                   "RandomResizedCrop", "RandomCrop"):
            setattr(tv_tf, nm, _Unused)
        tv_tf.InterpolationMode = InterpolationMode

        tv_ops = types.ModuleType("torchvision.ops")
        tv_ops.roi_align = _raise_on_use("roi_align")
        tv_ops.roi_pool = _raise_on_use("roi_pool")

        tv_models = types.ModuleType("torchvision.models")

        def _ref_resnet50(pretrained=False, **kw):
            svqa = importlib.import_module(f"{_PKG}.backbones.simpleVQA_model")
            return svqa.resnet50(pretrained=bool(pretrained), **kw)

        def _dummy_model(pretrained=False, **kw):
            return nn.Module()  # get_network builds these eagerly; unused

        tv_models.resnet50 = _ref_resnet50
        for nm in ("vgg16", "vgg16_bn", "resnet18", "resnet34",
                   "resnet101", "resnet152"):
            setattr(tv_models, nm, _dummy_model)

        tv.io = tv_io
        tv.transforms = tv_tf
        tv.ops = tv_ops
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.io"] = tv_io
        sys.modules["torchvision.transforms"] = tv_tf
        sys.modules["torchvision.ops"] = tv_ops
        sys.modules["torchvision.models"] = tv_models

    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = ftfy


# --------------------------------------------------------------------------
# reference package import (skipping side-effectful __init__.py files)


def _shell_pkg(name: str, path: str) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        mod.__path__ = [path]
        mod.__package__ = name
        sys.modules[name] = mod
    return mod


def import_reference(root: str = REF_ROOT) -> SimpleNamespace:
    """Import the reference model modules; returns a namespace with
    ``ksvqe_model``, ``patchnet``, ``clip_backbone``, ``clip_model``,
    ``head``, ``simplevqa``."""
    install_stubs()
    _shell_pkg(_PKG, f"{root}/models")
    _shell_pkg(f"{_PKG}.backbones", f"{root}/models/backbones")
    with contextlib.redirect_stdout(io.StringIO()):
        ksvqe_model = importlib.import_module(f"{_PKG}.backbones.KSVQE_model")
        clip_backbone = importlib.import_module(
            f"{_PKG}.backbones.CLIP_backbone"
        )
        patchnet = importlib.import_module(f"{_PKG}.backbones.patchnet")
        clip_model = importlib.import_module(f"{_PKG}.backbones.clip.model")
        head = importlib.import_module(f"{_PKG}.head")
        simplevqa = importlib.import_module(
            f"{_PKG}.backbones.simpleVQA_model"
        )
    return SimpleNamespace(
        ksvqe_model=ksvqe_model,
        patchnet=patchnet,
        clip_backbone=clip_backbone,
        clip_model=clip_model,
        head=head,
        simplevqa=simplevqa,
    )


@contextlib.contextmanager
def _patched(obj, name, value):
    old = getattr(obj, name)
    setattr(obj, name, value)
    try:
        yield
    finally:
        setattr(obj, name, old)


# --------------------------------------------------------------------------
# reference model builders (seeded random weights)


class ReferenceVQANet:
    """Late-bound torch wrapper with the reference VQA_Network state-dict
    layout (``models/model.py:72-75``: attributes ``<key>_backbone`` and
    ``<key>_head``) and its forward arity (``:105-121``)."""

    def __new__(cls, key, backbone, head):
        import torch.nn as nn

        class _Net(nn.Module):
            def __init__(self):
                super().__init__()
                setattr(self, f"{key}_backbone", backbone)
                setattr(self, f"{key}_head", head)
                self.key = key

            def forward(self, inputs):
                bb = getattr(self, f"{key}_backbone")
                hd = getattr(self, f"{key}_head")
                if key == "KSVQE":
                    feat, dis_loss = bb(inputs)
                    return hd(feat), dis_loss
                return hd(bb(inputs))

        return _Net()


def build_reference_ksvqe(
    seed: int = 0,
    root: str = REF_ROOT,
    num_samples: int = 1,
    sample_type: str = "topkpertubation",
    clip_location: int = 8,
    cls_use: bool = True,
    tuning_stage: int = 1,
    a1: float = 1.0,
    a2: float = 2.0,
    head_hidden: int = 64,
):
    """Reference KSVQE + VQAHead with seeded random weights, eval mode.

    Arg defaults mirror ``config/Kwai_KSVQE.yml`` (the reference's shipped
    KSVQE config).  Weight acquisition is patched: CLIP ViT-B/16 is built
    directly from ``clip.model.CLIP`` with random init instead of the
    sha256 download (reference ``clip/clip.py:39-68``), and the CONTRIQUE
    ``torch.load`` (``KSVQE_model.py:1078``) returns a fresh random
    state-dict of the same architecture.
    """
    import torch

    mods = import_reference(root)
    M, CB = mods.ksvqe_model, mods.clip_backbone

    torch.manual_seed(seed)

    def _fake_load_clip(backbone_name="ViT-B/16"):
        assert backbone_name == "ViT-B/16"
        return mods.clip_model.CLIP(
            embed_dim=512,
            image_resolution=224,
            vision_layers=12,
            vision_width=768,
            vision_patch_size=16,
            context_length=77,
            vocab_size=49408,
            transformer_width=512,
            transformer_heads=8,
            transformer_layers=12,
        )

    contrique_sd = M.CONTRIQUE_model(
        M.get_network("resnet50", pretrained=False), 2048
    ).state_dict()

    with contextlib.redirect_stdout(io.StringIO()), _patched(
        CB, "load_clip_to_cpu", _fake_load_clip
    ), _patched(torch, "load", lambda *a, **k: contrique_sd):
        backbone = M.KSVQE(
            pretrained=None,
            num_samples=num_samples,
            sample_type=sample_type,
            CLIP_location=clip_location,
            cls_use=cls_use,
            tuning_stage=tuning_stage,
            a1=a1,
            a2=a2,
            frozen_stages=-1,
        )
    head = mods.head.VQAHead(in_channels=768, hidden_channels=head_hidden)
    net = ReferenceVQANet("KSVQE", backbone, head)
    net.eval()
    return net


def build_reference_simplevqa(
    seed: int = 0, root: str = REF_ROOT, head_hidden: int = 128
):
    """Reference SimpleVQA ResNet-50 + simpleVQAHead with seeded random
    weights, eval mode (``simpleVQA_model.py:226-262``, ``head.py:10-31``)."""
    import torch

    mods = import_reference(root)
    torch.manual_seed(seed)
    backbone = mods.simplevqa.resnet50(pretrained=False)
    head = mods.head.simpleVQAHead(
        in_channels=4096 + 2048 + 1024 + 2048 + 256,
        hidden_channels=head_hidden,
    )
    net = ReferenceVQANet("simpleVQA", backbone, head)
    net.eval()
    return net


# --------------------------------------------------------------------------
# input builders (dataset-faithful normalization, seeded)

_IMAGENET_MEAN_255 = np.array([123.675, 116.28, 103.53], np.float32)
_IMAGENET_STD_255 = np.array([58.395, 57.12, 57.375], np.float32)
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def make_ksvqe_inputs(
    B: int = 1, T: int = 8, frag: int = 288, resize: int = 224, seed: int = 0
) -> dict[str, np.ndarray]:
    """Random-pixel KSVQE eval batch, normalized like the KVQ dataset
    (fragment: ImageNet 0-255 stats, resize view: CLIP stats; reference
    ``fusion_datasets.py:953-957,1017-1024``).  Channels-LAST layout
    (B,T,H,W,3) — use :func:`to_torch_video` for the reference's
    (B,3,T,H,W)."""
    rng = np.random.default_rng(seed)
    frag_px = rng.uniform(0.0, 255.0, size=(B, T, frag, frag, 3))
    re_px = rng.uniform(0.0, 1.0, size=(B, T, resize, resize, 3))
    return {
        "fragment": ((frag_px - _IMAGENET_MEAN_255) / _IMAGENET_STD_255)
        .astype(np.float32),
        "resize_video": ((re_px - _CLIP_MEAN) / _CLIP_STD).astype(np.float32),
        "dis_label": rng.integers(0, 7, size=(B,)).astype(np.int64),
    }


def make_simplevqa_inputs(
    B: int = 1, T: int = 8, size: int = 448, seed: int = 0
) -> dict[str, np.ndarray]:
    """Random SimpleVQA eval batch: unit-scale frames WITHOUT /255 (the
    reference quirk, ``fusion_datasets.py:811-812`` applies ImageNet
    unit-stats to 0-255 pixels) plus SlowFast features."""
    rng = np.random.default_rng(seed)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    px = rng.uniform(0.0, 1.0, size=(B, T, size, size, 3))
    return {
        "simpleVQA": ((px - mean) / std).astype(np.float32),
        "feat": rng.normal(size=(B, T, 2304)).astype(np.float32),
    }


def to_torch_video(x: np.ndarray):
    """(B,T,H,W,C) channels-last -> torch (B,C,T,H,W)."""
    import torch

    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 4, 1, 2, 3)))
