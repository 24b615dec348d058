"""Config system.

Accepts the *same YAML schema* as the reference
(`/root/reference/config/*.yml`, loaded via ``yaml.safe_load`` in
``train.py:42-43``) so reference configs run unchanged, but adds a thin
validation/defaults layer the reference lacks (SURVEY.md §5: "No validation,
no defaults layer").

The config is kept as a plain nested dict (the reference passes raw dicts
everywhere) with typed accessor helpers; model/data sub-configs are resolved
through :mod:`kvq_tpu.core.registry`.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any, Mapping

import yaml

# Keys understood at the top level of a config file.  Mirrors
# reference config/Kwai_KSVQE.yml:1-95 / kwai_simpleVQA.yml.
_TOP_LEVEL_DEFAULTS: dict[str, Any] = {
    "name": "experiment",
    "num_epochs": 1,
    "l_num_epochs": 0,
    "warmup_epochs": 0.0,
    "ema": True,
    "ema_decay": 0.999,          # hardcoded 0.999 in reference trainer.py:169
    "save_model": True,
    "batch_size": 4,
    "num_workers": 6,
    "split_seed": 42,
    "ddp": False,
    "seed": 42,
    "load_path": None,
    "test_load_path": None,
    # Extensions (defaults preserve reference behavior):
    "rank_loss_weight": 0.0,     # reference computes rank_loss but never adds
                                 # it (trainer.py:152-153) => default 0
    "contra_loss_weight": 0.3,   # 0.3 * dis_contra_loss (trainer.py:144)
    "compute_dtype": "bfloat16",
    "param_dtype": "float32",
}


def load_config(path: str) -> dict[str, Any]:
    """Load a YAML config file, reference-schema compatible."""
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    return normalize_config(cfg)


def normalize_config(cfg: Mapping[str, Any]) -> dict[str, Any]:
    """Fill defaults and validate the minimal structure."""
    out = copy.deepcopy(dict(cfg))
    for k, v in _TOP_LEVEL_DEFAULTS.items():
        out.setdefault(k, v)
    if "model" in out:
        model = out["model"]
        if "type" not in model or "args" not in model:
            raise ValueError("config['model'] must have 'type' and 'args' keys")
    if "optimizer" in out:
        opt = out["optimizer"]
        opt.setdefault("lr", 3e-5)
        opt.setdefault("backbone_lr_mult", 1.0)
        opt.setdefault("wd", 0.05)
    return out


def model_keys(cfg: Mapping[str, Any]) -> list[str]:
    """The registry keys composing the model (reference models/model.py:28)."""
    return list(cfg["model"]["args"].keys())


def key_list(cfg: Mapping[str, Any]) -> list[str]:
    """Data-dict keys the trainer moves/reshapes (reference trainer.py:56)."""
    return str(cfg["model"]["type"]).split(",")


@dataclass
class OptimizerConfig:
    lr: float = 3e-5
    backbone_lr_mult: float = 1.0
    wd: float = 0.05

    @classmethod
    def from_dict(cls, d: Mapping[str, Any] | None) -> "OptimizerConfig":
        d = d or {}
        return cls(
            lr=float(d.get("lr", 3e-5)),
            backbone_lr_mult=float(d.get("backbone_lr_mult", 1.0)),
            wd=float(d.get("wd", 0.05)),
        )


@dataclass
class ScheduleConfig:
    """Linear warmup + cosine decay, exact lambda from reference
    trainer.py:109-113 (warmup in iters, cosine over total iters)."""

    warmup_iters: int
    max_iters: int
    base_lr: float

    def __call__(self, step: int) -> float:
        import math

        if self.warmup_iters > 0 and step <= self.warmup_iters:
            return self.base_lr * step / self.warmup_iters
        return self.base_lr * 0.5 * (
            1 + math.cos(math.pi * (step - self.warmup_iters) / self.max_iters)
        )


@dataclass
class MeshConfig:
    """Device-mesh shape for the parallel train/eval steps.

    The reference's parallelism is DP-only (SURVEY.md §2.4).  We express DP
    as the 'data' axis and optionally shard parameters / optimizer state over
    a 'fsdp' axis (zero-style), which the reference has no analog for.
    """

    data: int = 1
    fsdp: int = 1
    axis_names: tuple[str, str] = ("data", "fsdp")

    @property
    def num_devices(self) -> int:
        return self.data * self.fsdp
