"""Optimizer, LR schedule, parameter freezing, EMA.

  - AdamW with torch-default betas/eps and decoupled weight decay applied to
    every parameter, matching reference ``torch.optim.AdamW(lr, wd)``
    (trainer.py:97-102);
  - linear-warmup + cosine schedule, exact lambda of trainer.py:104-113;
  - ``backbone_lr_mult`` applied to params under ``*_backbone`` subtrees.
    (The reference *intends* this but its named_children walk sees only the
    DataParallel 'module' wrapper so the mult is a no-op — and configs ship
    mult=1.  We implement it correctly; default 1 keeps parity.)
  - frozen subtrees (CLIP tool minus adapters, CONTRIQUE) get zeroed
    updates via an optax mask — the analog of requires_grad=False
    (KSVQE_model.py:1085-1086, CLIP_backbone.py:141-154);
  - EMA: p_ema = 0.999*p_ema + 0.001*p each step over *all* params
    (trainer.py:166-172).
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def warmup_cosine_schedule(
    base_lr: float, warmup_iters: int, max_iters: int
) -> Callable[[int], float]:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_iters, 1)
        cos = 0.5 * (
            1 + jnp.cos(math.pi * (step - warmup_iters) / jnp.maximum(max_iters, 1))
        )
        return base_lr * jnp.where(
            (warmup_iters > 0) & (step <= warmup_iters), warm, cos
        )

    return fn


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def trainable_mask(params, frozen_patterns: tuple[tuple[str, tuple[str, ...]], ...]):
    """True where trainable.  ``frozen_patterns`` is a tuple of
    (frozen_substring, (exempt_substrings...)) pairs."""

    def decide(path, _):
        p = _path_str(path)
        for frozen, exempt in frozen_patterns:
            if frozen in p and not any(e in p for e in exempt):
                return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def backbone_lr_mask(params) -> Any:
    """True for params inside a '*_backbone' subtree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "_backbone" in _path_str(path), params
    )


def build_optimizer(
    params,
    lr: float,
    weight_decay: float,
    warmup_iters: int,
    max_iters: int,
    backbone_lr_mult: float = 1.0,
    frozen_patterns: tuple[tuple[str, tuple[str, ...]], ...] = (),
) -> optax.GradientTransformation:
    schedule = warmup_cosine_schedule(lr, warmup_iters, max_iters)
    tx = optax.adamw(
        learning_rate=schedule,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=weight_decay,
    )
    if frozen_patterns:
        # Mask adamw itself to the trainable subtree (not merely the final
        # update): if adamw consumed the frozen-leaf gradients for moment
        # updates, XLA could not dead-code-eliminate the backward pass
        # through the frozen towers — the reference never computes those
        # gradients at all (requires_grad=False prunes torch autograd,
        # CLIP_backbone.py:141-154, KSVQE_model.py:1085-1086).  With the
        # frozen leaves bypassing adamw and then being set_to_zero, their
        # gradients are dead values and the frozen-tower backward (full
        # CLIP below the adapters, CONTRIQUE) compiles away entirely.
        mask = trainable_mask(params, frozen_patterns)
        chain = [
            optax.masked(tx, mask),
            optax.masked(
                optax.set_to_zero(),
                jax.tree_util.tree_map(lambda t: not t, mask),
            ),
        ]
    else:
        chain = [tx]
    if backbone_lr_mult != 1.0:
        bb_mask = backbone_lr_mask(params)
        chain.append(
            optax.masked(optax.scale(backbone_lr_mult), bb_mask)
        )
    return optax.chain(*chain) if len(chain) > 1 else chain[0]


def ema_update(ema_params, params, decay: float = 0.999):
    """Reference EMA (trainer.py:166-172): in-place mul+add per step."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        params,
    )


KSVQE_FROZEN_PATTERNS: tuple[tuple[str, tuple[str, ...]], ...] = (
    # CLIP visual tower frozen except the cls adapters
    # (CLIP_backbone.py:141-154)
    ("CLIP_tool", ("adapter",)),
    # CONTRIQUE encoder+projector fully frozen (KSVQE_model.py:1085-1086);
    # the separate dist_adapter stays trainable.
    ("distortion_tool", ()),
)
