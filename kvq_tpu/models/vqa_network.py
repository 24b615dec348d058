"""Model composition — the counterpart of reference ``VQA_Network``
(models/model.py:18-121).

Builds one ``<key>_backbone`` + ``<key>_head`` pair per key of
``config['model']['args']`` and sums scores when ``reduce_scores`` is set.
Supported keys (reference models/model.py:30-71): ``swin_tiny``,
``swin_tiny_grpb`` (FastVQA), ``swin_tiny_grpb_m``, ``swin_small``,
``conv_tiny``, ``simpleVQA``, ``KSVQE``.  The KSVQE branch additionally
returns the distortion-contrastive loss.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .heads_util import build_head
from ..nn.resnet import FeatureResNet


def _dtype_of(hypers: dict | None, default=jnp.bfloat16):
    d = (hypers or {}).get("compute_dtype")
    if d is None:
        return default
    return jnp.dtype(d)


def build_backbone(key: str, hypers: dict | None, dtype, bn_axis_name=None):
    hypers = hypers or {}
    bb = hypers.get("backbone") or {}
    if key == "simpleVQA":
        return FeatureResNet(
            layers=tuple(bb.get("layers", (3, 4, 6, 3))),
            dtype=dtype,
            bn_axis_name=bn_axis_name,
        )
    if key in ("swin_tiny", "swin_small", "swin_tiny_grpb", "swin_tiny_grpb_m"):
        from ..nn.swin import SwinTransformer3D, swin_config

        return SwinTransformer3D(config=swin_config(key, bb), dtype=dtype)
    if key == "conv_tiny":
        from ..nn.convnext import ConvNeXt3D

        return ConvNeXt3D(dtype=dtype)
    if key == "KSVQE":
        from ..nn.ksvqe import KSVQE, ksvqe_config

        return KSVQE(config=ksvqe_config(bb), dtype=dtype)
    raise NotImplementedError(f"unknown model key {key!r}")


class VQANetwork(nn.Module):
    config: dict
    bn_axis_name: str | None = None

    def setup(self):
        args = self.config["model"]["args"]
        dtype = _dtype_of(self.config.get("model"))
        backbones = {}
        heads = {}
        for key, hypers in args.items():
            backbones[key] = build_backbone(
                key, hypers, dtype, bn_axis_name=self.bn_axis_name
            )
            heads[key] = build_head(key, (hypers or {}).get("head") or {}, dtype)
        # attribute names match the reference's '<key>_backbone' convention,
        # which also keeps torch-checkpoint key mapping mechanical.
        for key in args:
            setattr(self, f"{key}_backbone", backbones[key])
            setattr(self, f"{key}_head", heads[key])
        self.key_names = list(args.keys())

    def __call__(
        self,
        inputs: dict[str, Any],
        *,
        train: bool = False,
        reduce_scores: bool = False,
        return_pooled_feats: bool = False,
    ):
        scores = []
        feats: dict[str, Any] = {}
        dis_contra_loss = None
        for key in self.key_names:
            backbone = getattr(self, f"{key}_backbone")
            head = getattr(self, f"{key}_head")
            if key == "KSVQE":
                feat, dis_contra_loss = backbone(inputs, train=train)
            else:
                feat = backbone(inputs, train=train)
            scores.append(head(feat, train=train))
            if return_pooled_feats:
                feats[key] = feat
        if reduce_scores:
            out = scores[0]
            for s in scores[1:]:
                out = out + s
            scores = out
        # return arity mirrors reference models/model.py:105-121
        if return_pooled_feats:
            if dis_contra_loss is not None:
                return scores, feats, dis_contra_loss
            return scores, feats
        if dis_contra_loss is not None:
            return scores, dis_contra_loss
        return scores
