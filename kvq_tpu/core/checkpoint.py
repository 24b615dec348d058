"""Checkpoint save/load.

Upgrades over the reference (which saves params-only best checkpoints,
trainer.py:223-230, and has no optimizer/step resume — SURVEY.md §5):
full train-state checkpoints (params + batch stats + EMA + opt state +
step + validation results) via flax msgpack serialization, with
best-checkpoint naming compatible with the reference convention
``{name}_head_{test_set}_{n|s}_finetuned``.
"""

from __future__ import annotations

import os
from typing import Any

import flax.serialization as ser
import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = ser.msgpack_serialize(_to_numpy(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, target: dict[str, Any] | None = None):
    with open(path, "rb") as f:
        data = ser.msgpack_restore(f.read())
    if target is not None:
        return ser.from_state_dict(target, data)
    return data


def merge_params(init_params, loaded_params, strict: bool = False):
    """strict=False load: graft matching-by-path-and-shape leaves of
    ``loaded_params`` onto ``init_params`` (reference
    ``load_state_dict(strict=False)`` semantics, trainer.py:74)."""
    flat_init = _flatten(init_params)
    flat_load = _flatten(loaded_params)
    missing, unexpected, mismatched = [], [], []
    out = dict(flat_init)
    for k, v in flat_load.items():
        if k not in flat_init:
            unexpected.append(k)
            continue
        if np.shape(flat_init[k]) != np.shape(v):
            mismatched.append(k)
            continue
        out[k] = v
    for k in flat_init:
        if k not in flat_load:
            missing.append(k)
    if strict and (missing or unexpected or mismatched):
        raise ValueError(
            f"strict load failed: missing={missing} unexpected={unexpected} "
            f"mismatched={mismatched}"
        )
    return _unflatten(out), dict(
        missing=missing, unexpected=unexpected, mismatched=mismatched
    )


def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    else:
        flat[prefix[:-1]] = tree
    return flat


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree
