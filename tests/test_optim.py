"""Optimizer masking: frozen subtrees must not move AND their gradients
must be dead values (adamw is masked, not merely the final update — see
build_optimizer; reference freeze semantics CLIP_backbone.py:141-154,
KSVQE_model.py:1085-1086)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kvq_tpu.train.optim import (
    KSVQE_FROZEN_PATTERNS,
    build_optimizer,
    trainable_mask,
)


def _params():
    k = jax.random.key(0)
    leaf = lambda i: jnp.full((3,), float(i + 1))  # noqa: E731
    return {
        "ksvqe_backbone": {
            "CLIP_tool": {
                "blocks_0": {"w": leaf(0)},
                "adapter_layer_0": {"w": leaf(1)},
            },
            "distortion_tool": {"conv1": {"w": leaf(2)}},
            "dist_adapter": {"w": leaf(3)},
            "stage0": {"w": leaf(4)},
        }
    }


def test_frozen_leaves_do_not_move():
    params = _params()
    tx = build_optimizer(
        params, lr=1e-2, weight_decay=0.05, warmup_iters=0, max_iters=10,
        frozen_patterns=KSVQE_FROZEN_PATTERNS,
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)

    bb = new["ksvqe_backbone"]
    old = params["ksvqe_backbone"]
    # frozen: CLIP tower ex-adapters, full CONTRIQUE
    np.testing.assert_array_equal(
        bb["CLIP_tool"]["blocks_0"]["w"], old["CLIP_tool"]["blocks_0"]["w"]
    )
    np.testing.assert_array_equal(
        bb["distortion_tool"]["conv1"]["w"], old["distortion_tool"]["conv1"]["w"]
    )
    # trainable: CLIP adapters, dist_adapter, swin stages
    for a, b in [
        (bb["CLIP_tool"]["adapter_layer_0"]["w"],
         old["CLIP_tool"]["adapter_layer_0"]["w"]),
        (bb["dist_adapter"]["w"], old["dist_adapter"]["w"]),
        (bb["stage0"]["w"], old["stage0"]["w"]),
    ]:
        assert not np.allclose(np.asarray(a), np.asarray(b))


def test_frozen_gradients_are_dead_values():
    """The compiled update must not depend on frozen-leaf gradients: feeding
    garbage there must not change any update (XLA may then DCE the whole
    frozen backward)."""
    params = _params()
    tx = build_optimizer(
        params, lr=1e-2, weight_decay=0.05, warmup_iters=0, max_iters=10,
        frozen_patterns=KSVQE_FROZEN_PATTERNS,
    )
    state = tx.init(params)
    mask = trainable_mask(params, KSVQE_FROZEN_PATTERNS)

    g1 = jax.tree_util.tree_map(jnp.ones_like, params)
    g2 = jax.tree_util.tree_map(
        lambda g, t: g if t else g * jnp.nan, g1, mask
    )
    u1, _ = jax.jit(tx.update)(g1, state, params)
    u2, _ = jax.jit(tx.update)(g2, state, params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        u1, u2,
    )
