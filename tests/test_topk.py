import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvq_tpu.ops.topk import (
    hard_topk_indicator,
    min_max_norm,
    perturbed_topk,
)


def test_hard_topk_indicator_one_hot():
    x = jnp.asarray([[0.1, 0.9, 0.3], [0.7, 0.2, 0.4]])
    ind = hard_topk_indicator(x, 1)
    np.testing.assert_array_equal(
        np.asarray(ind), [[[0, 1, 0]], [[1, 0, 0]]]
    )
    ind2 = hard_topk_indicator(x, 2)
    # indices sorted ascending
    np.testing.assert_array_equal(
        np.asarray(ind2), [[[0, 1, 0], [0, 0, 1]], [[1, 0, 0], [0, 0, 1]]]
    )


def test_perturbed_topk_rows_are_distributions():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 9)), jnp.float32)
    ind = perturbed_topk(x, jax.random.key(0), 1, 100, 0.5)
    assert ind.shape == (4, 1, 9)
    np.testing.assert_allclose(np.asarray(ind.sum(-1)), 1.0, rtol=1e-6)
    assert (np.asarray(ind) >= 0).all()


def test_perturbed_topk_low_sigma_is_hard():
    x = jnp.asarray([[0.0, 5.0, 1.0]])
    ind = perturbed_topk(x, jax.random.key(1), 1, 50, 1e-3)
    np.testing.assert_allclose(np.asarray(ind), [[[0, 1, 0]]], atol=1e-6)


def test_perturbed_topk_gradient_estimator():
    """Golden check of the custom vjp against a direct numpy computation of
    the estimator einsum('bnkd,bnd->bkd')/nS/sigma (patchnet.py:120-126)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 5)), jnp.float32)
    key = jax.random.key(3)
    nS, sigma = 20, 0.4
    g = jnp.asarray(rng.normal(size=(2, 1, 5)), jnp.float32)

    grad = jax.vjp(lambda xx: perturbed_topk(xx, key, 1, nS, sigma), x)[1](g)[0]

    # reproduce forward internals
    noise = jax.random.normal(key, (2, nS, 5), dtype=x.dtype)
    pert = np.asarray(x)[:, None, :] + np.asarray(noise) * sigma
    idx = np.argsort(pert, axis=-1)[..., -1:]
    onehot = np.zeros((2, nS, 1, 5), np.float32)
    for b in range(2):
        for n in range(nS):
            onehot[b, n, 0, idx[b, n, 0]] = 1
    expected_grad_full = np.einsum("bnkd,bnd->bkd", onehot, np.asarray(noise)) / nS / sigma
    expected = np.einsum("bkd,bkd->bd", np.asarray(g), expected_grad_full)
    np.testing.assert_allclose(np.asarray(grad), expected, atol=1e-5)


def test_perturbed_topk_grad_zero_at_tiny_sigma():
    x = jnp.asarray([[1.0, 2.0, 3.0]])
    grad = jax.grad(
        lambda xx: perturbed_topk(xx, jax.random.key(0), 1, 10, 1e-25).sum()
    )(x)
    np.testing.assert_array_equal(np.asarray(grad), 0)


def test_min_max_norm():
    x = jnp.asarray([[2.0, 4.0, 6.0]])
    out = np.asarray(min_max_norm(x))
    np.testing.assert_allclose(out, [[0.0, 0.5, 1.0]], atol=1e-4)
