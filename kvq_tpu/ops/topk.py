"""Differentiable top-k selection primitives.

``perturbed_topk`` reproduces the reference's PerturbedTopKFunction custom
autograd (patchnet.py:83-128) as a ``jax.custom_vjp``:

  forward:  add ``num_samples`` Gaussian perturbations, hard top-k each,
            one-hot the (sorted) indices, average -> soft indicator (b,k,d)
  backward: dL/dx = <g, E[one_hot ⊗ noise]/σ>  — the same estimator
            (einsum("bnkd,bnd->bkd")/nS/σ then einsum("bkd,bkd->bd")).

Randomness is explicit (a jax PRNG key) instead of torch's global RNG.
``hard_topk_indicator`` is the eval-mode switch (HardTopK, patchnet.py:60):
exact top-k as a one-hot indicator so train/eval share one gather-free
weighted-sum code path downstream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def perturbed_topk(x, key, k: int, num_samples: int, sigma: float):
    ind, _ = _perturbed_topk_fwd(x, key, k, num_samples, sigma)
    return ind


def _perturbed_topk_fwd(x, key, k: int, num_samples: int, sigma: float):
    b, d = x.shape
    noise = jax.random.normal(key, (b, num_samples, d), dtype=x.dtype)
    perturbed = x[:, None, :] + noise * sigma  # (b, nS, d)
    _, indices = jax.lax.top_k(perturbed, k)  # (b, nS, k)
    indices = jnp.sort(indices, axis=-1)
    onehot = jax.nn.one_hot(indices, d, dtype=x.dtype)  # (b, nS, k, d)
    indicators = onehot.mean(axis=1)  # (b, k, d)
    return indicators, (onehot, noise)


def _perturbed_topk_bwd(k, num_samples, sigma, res, g):
    onehot, noise = res
    if sigma <= 1e-20:
        return jnp.zeros(noise.shape[::2], noise.dtype), None
    expected_grad = (
        jnp.einsum("bnkd,bnd->bkd", onehot, noise) / num_samples / sigma
    )
    grad_x = jnp.einsum("bkd,bkd->bd", g, expected_grad)
    return grad_x, None


perturbed_topk.defvjp(_perturbed_topk_fwd, _perturbed_topk_bwd)


def hard_topk_indicator(x, k: int):
    """Exact top-k as a (b, k, d) one-hot indicator, indices sorted
    ascending (eval path; HardTopK semantics)."""
    _, indices = jax.lax.top_k(x, k)
    indices = jnp.sort(indices, axis=-1)
    return jax.nn.one_hot(indices, x.shape[-1], dtype=x.dtype)


def gumbel_topk_indicator(x, key, k: int = 1, tau: float = 1.0):
    """Straight-through Gumbel softmax indicator (reference gumbel_softmax,
    patchnet.py:366-390), k=1 only."""
    g = -jnp.log(-jnp.log(jax.random.uniform(key, x.shape) + 1e-20) + 1e-20)
    y_soft = jax.nn.softmax((x + g) / tau, axis=-1)
    idx = jnp.argmax(y_soft, axis=-1)
    y_hard = jax.nn.one_hot(idx, x.shape[-1], dtype=x.dtype)
    st = y_hard - jax.lax.stop_gradient(y_soft) + y_soft
    return st[:, None, :]  # (b, 1, d)


def min_max_norm(x, axis: int = -1, eps: float = 1e-5):
    """Reference min_max_norm (patchnet.py:160-164)."""
    mn = x.min(axis=axis, keepdims=True)
    mx = x.max(axis=axis, keepdims=True)
    return (x - mn) / (mx - mn + eps)
