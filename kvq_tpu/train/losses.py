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
    z = distortion_feature.reshape(b * t * g, c).astype(jnp.float32)
    z = z / (jnp.linalg.norm(z, axis=1, keepdims=True) + 1e-12)
    sim = (z @ z.T) / 0.1

    same = (dis_label[:, None] == dis_label[None, :]).astype(jnp.float32)  # (b,b)
    # rows repeated t*g times: labels (N, b) with N = b*t*g
    labels = jnp.repeat(same, t * g, axis=0)
    positive = labels @ labels.T  # count-valued (N, N)
    n = b * t * g
    eye = jnp.eye(n, dtype=jnp.float32)
    positive = positive * (1.0 - eye)
    zero_diag = 1.0 - eye

    positive_sum = jnp.sum(positive, axis=1)
    denominator = jnp.sum(jnp.exp(sim) * zero_diag, axis=1)
    return jnp.mean(
        jnp.log(denominator) - jnp.sum(sim * positive, axis=1) / positive_sum
    )


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
