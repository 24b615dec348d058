"""Training losses.

Exact formulas of the reference:
  - :func:`plcc_loss`  (trainer.py:346-355)
  - :func:`rank_loss`  (trainer.py:337-345) — computed by the reference but
    never added to the total loss (SURVEY.md §5.1.2); wired here behind
    ``rank_loss_weight`` (default 0 = reference behavior)
  - :func:`distortion_contrastive_supervised` (KSVQE_model.py:1666-1691) —
    supervised InfoNCE over distortion tokens at temperature 0.1, with the
    reference's count-valued positive mask reproduced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def plcc_loss(y_pred: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pearson-correlation-induced loss over a batch of scores."""
    y_pred = y_pred.astype(jnp.float32)
    y = y.astype(jnp.float32)
    sigma_hat = jnp.std(y_pred)
    m_hat = jnp.mean(y_pred)
    y_pred = (y_pred - m_hat) / (sigma_hat + 1e-8)
    sigma = jnp.std(y)
    m = jnp.mean(y)
    y = (y - m) / (sigma + 1e-8)
    loss0 = jnp.mean((y_pred - y) ** 2) / 4
    rho = jnp.mean(y_pred * y)
    loss1 = jnp.mean((rho * y_pred - y) ** 2) / 4
    return (loss0 + loss1) / 2


def rank_loss(y_pred: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise ranking hinge, normalized by its own max (+1)."""
    y_pred = y_pred.reshape(-1, 1).astype(jnp.float32)
    y = y.reshape(-1, 1).astype(jnp.float32)
    ranking = jax.nn.relu((y_pred - y_pred.T) * jnp.sign(y.T - y))
    scale = 1.0 + jnp.max(ranking)
    n = y_pred.shape[0]
    return jnp.sum(ranking) / n / (n - 1) / scale


def distortion_contrastive_supervised(
    distortion_feature: jnp.ndarray, dis_label: jnp.ndarray
) -> jnp.ndarray:
    """Supervised contrastive loss over per-patch distortion embeddings.

    ``distortion_feature``: (B, T, G, C); ``dis_label``: (B,) int.
    Positives are all patches from batch items with the same distortion
    label (weighted by same-class count, matching the reference's
    unnormalized mask product).
    """
    b, t, g, c = distortion_feature.shape
    tg = t * g
    n = b * tg
    z = distortion_feature.reshape(n, c).astype(jnp.float32)
    z = z / (jnp.linalg.norm(z, axis=1, keepdims=True) + 1e-12)
    sim = (z @ z.T) / 0.1

    # The reference materializes a count-valued (N, N) positive mask
    # (labels @ labels.T with rows of `same` repeated t*g times) plus an
    # (N, N) zero-diag mask.  positive[i, j] = P[b_i, b_j] for all j in
    # batch-block b_j, so every (N, N) contraction against it collapses to
    # per-batch-block row sums — identical math, O(N*b) temporaries instead
    # of several O(N^2) ones (N = b*t*g = 9408 at eval shapes).
    same = (dis_label[:, None] == dis_label[None, :]).astype(jnp.float32)
    P = same @ same.T  # (b, b) count-valued
    # take sim's own diagonal (NOT a recomputed z.z): exp(diag) ~ e^10 is
    # subtracted from the row sum, so the two must cancel exactly
    diag_sim = jnp.diagonal(sim)

    denominator = jnp.sum(jnp.exp(sim), axis=1) - jnp.exp(diag_sim)
    row_block = sim.reshape(n, b, tg).sum(axis=2)  # (N, b)
    P_rows = jnp.repeat(P, tg, axis=0)  # (N, b)
    P_diag = jnp.repeat(jnp.diagonal(P), tg)  # (N,)
    numerator = jnp.sum(P_rows * row_block, axis=1) - P_diag * diag_sim
    positive_sum = jnp.sum(P_rows, axis=1) * tg - P_diag
    return jnp.mean(jnp.log(denominator) - numerator / positive_sum)


def total_loss(
    scores: list[jnp.ndarray],
    labels: jnp.ndarray,
    dis_contra_loss: jnp.ndarray | None = None,
    contra_weight: float = 0.3,
    rank_weight: float = 0.0,
) -> tuple[jnp.ndarray, dict]:
    """Reference composite: 0.3*dis_contra (KSVQE) + sum of plcc per head
    (trainer.py:144-153); rank loss optional (default off, §5.1.2)."""
    y = labels.reshape(-1, 1).astype(jnp.float32)
    loss = jnp.asarray(0.0, jnp.float32)
    aux: dict = {}
    if dis_contra_loss is not None:
        loss = loss + contra_weight * dis_contra_loss
        aux["dis_contra_loss"] = dis_contra_loss
    for i, s in enumerate(scores):
        p = plcc_loss(s, y)
        aux[f"plcc_loss_{i}"] = p
        loss = loss + p
        if rank_weight:
            r = rank_loss(s, y)
            aux[f"rank_loss_{i}"] = r
            loss = loss + rank_weight * r
    aux["total_loss"] = loss
    return loss, aux
