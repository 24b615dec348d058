"""CONTRIQUE frozen-BN fold (nn/contrique.py:_fold): the folded conv path
must reproduce the module path exactly (same variable tree, exact
algebra — reference KSVQE_model.py:1622-1665 runs the tool frozen with
running stats, so bn(conv(x)) == conv'(x)+b' identically)."""

import jax
import jax.numpy as jnp
import numpy as np

from kvq_tpu.nn.contrique import CONTRIQUE


def _randomized_variables(v, seed=0):
    """Random params AND non-trivial running stats (init gives mean=0,
    var=1, scale=1, bias=0 — under which a broken fold could pass)."""
    rng = np.random.default_rng(seed)

    def rand(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        x = rng.normal(size=leaf.shape, scale=0.5).astype(leaf.dtype)
        if name == "var":
            return np.abs(x) + 0.3
        if name == "scale":
            return 1.0 + 0.3 * x
        return x

    return jax.tree_util.tree_map_with_path(rand, v)


def test_fold_bn_matches_module_path():
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 2, 64, 64, 3)), jnp.float32
    )
    kw = dict(layers=(1, 1, 1, 1), dtype=jnp.float32)
    m_fold = CONTRIQUE(fold_bn=True, **kw)
    m_mod = CONTRIQUE(fold_bn=False, **kw)
    v = _randomized_variables(m_mod.init(jax.random.key(0), x))

    out_mod = m_mod.apply(v, x)
    out_fold = m_fold.apply(v, x)
    assert out_fold.shape == out_mod.shape == (1, 2, 4, 128)
    # folding reassociates the f32 algebra (conv(x, W*a)+b vs
    # conv(x, W)*a+b), so allow a few-ulp-per-layer drift
    np.testing.assert_allclose(
        np.asarray(out_fold), np.asarray(out_mod), rtol=1e-3, atol=1e-3
    )


def test_fold_bn_init_tree_identical():
    """fold_bn must not change the variable tree (init runs the module
    path either way) — checkpoint and torch-import compatibility."""
    x = jnp.zeros((1, 1, 32, 32, 3), jnp.float32)
    kw = dict(layers=(1, 1, 1, 1), dtype=jnp.float32)
    sh_f = jax.eval_shape(
        lambda: CONTRIQUE(fold_bn=True, **kw).init(jax.random.key(0), x)
    )
    sh_m = jax.eval_shape(
        lambda: CONTRIQUE(fold_bn=False, **kw).init(jax.random.key(0), x)
    )
    assert jax.tree_util.tree_structure(sh_f) == jax.tree_util.tree_structure(
        sh_m
    )
