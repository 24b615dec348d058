"""Loss golden tests: the jax losses must match the reference formulas,
independently re-derived here in torch (torch is CPU-only in this image)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from kvq_tpu.train import losses as L


def torch_plcc_loss(y_pred, y):
    sigma_hat, m_hat = torch.std_mean(y_pred, unbiased=False)
    y_pred = (y_pred - m_hat) / (sigma_hat + 1e-8)
    sigma, m = torch.std_mean(y, unbiased=False)
    y = (y - m) / (sigma + 1e-8)
    loss0 = torch.nn.functional.mse_loss(y_pred, y) / 4
    rho = torch.mean(y_pred * y)
    loss1 = torch.nn.functional.mse_loss(rho * y_pred, y) / 4
    return (loss0 + loss1) / 2


def torch_rank_loss(y_pred, y):
    ranking = torch.nn.functional.relu(
        (y_pred - y_pred.t()) * torch.sign(y.t() - y)
    )
    scale = 1 + torch.max(ranking)
    return (
        torch.sum(ranking) / y_pred.shape[0] / (y_pred.shape[0] - 1) / scale
    )


def torch_supcon(feature, dis_label):
    b, t, g, _ = feature.shape
    z = feature.reshape(b * t * g, -1)
    z = torch.nn.functional.normalize(z, p=2, dim=1)
    sim = z @ z.T / 0.1
    dist_label = (dis_label.unsqueeze(1).repeat(1, b) == dis_label).float()
    dist_labels = dist_label.repeat(1, t * g).view(b * t * g, -1)
    positive = dist_labels @ dist_labels.T
    positive = positive.fill_diagonal_(0)
    N = b * t * g
    zero_diag = torch.ones((N, N)).fill_diagonal_(0)
    positive_sum = positive.sum(dim=1)
    denominator = torch.sum(torch.exp(sim) * zero_diag, dim=1)
    return torch.mean(
        torch.log(denominator) - torch.sum(sim * positive, dim=1) / positive_sum
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_plcc_loss_golden(seed):
    rng = np.random.default_rng(seed)
    yp = rng.normal(size=(6, 1)).astype(np.float32)
    y = rng.normal(size=(6, 1)).astype(np.float32)
    ours = float(L.plcc_loss(jnp.asarray(yp), jnp.asarray(y)))
    ref = float(torch_plcc_loss(torch.tensor(yp), torch.tensor(y)))
    assert ours == pytest.approx(ref, abs=1e-6)


def test_plcc_loss_perfect_correlation_small():
    y = jnp.arange(8.0).reshape(-1, 1)
    assert float(L.plcc_loss(y * 3 + 1, y)) == pytest.approx(0.0, abs=1e-6)


@pytest.mark.parametrize("seed", [0, 3])
def test_rank_loss_golden(seed):
    rng = np.random.default_rng(seed)
    yp = rng.normal(size=(5, 1)).astype(np.float32)
    y = rng.normal(size=(5, 1)).astype(np.float32)
    ours = float(L.rank_loss(jnp.asarray(yp), jnp.asarray(y)))
    ref = float(torch_rank_loss(torch.tensor(yp), torch.tensor(y)))
    assert ours == pytest.approx(ref, abs=1e-6)


def test_rank_loss_zero_for_correct_order():
    y = jnp.arange(5.0).reshape(-1, 1)
    assert float(L.rank_loss(y, y)) == pytest.approx(0.0, abs=1e-7)


@pytest.mark.parametrize("seed", [0, 2])
def test_supcon_golden(seed):
    rng = np.random.default_rng(seed)
    feat = rng.normal(size=(3, 2, 4, 16)).astype(np.float32)
    labels = np.array([0, 1, 0], dtype=np.int32)
    ours = float(
        L.distortion_contrastive_supervised(jnp.asarray(feat), jnp.asarray(labels))
    )
    ref = float(torch_supcon(torch.tensor(feat), torch.tensor(labels)))
    assert ours == pytest.approx(ref, rel=1e-3)  # f32 accumulation-order differences


def test_total_loss_composition():
    scores = [jnp.asarray([[0.1], [0.4], [0.2]])]
    labels = jnp.asarray([1.0, 2.0, 3.0])
    dis = jnp.asarray(2.0)
    loss, aux = L.total_loss(scores, labels, dis, contra_weight=0.3)
    expected = 0.3 * 2.0 + float(aux["plcc_loss_0"])
    assert float(loss) == pytest.approx(expected, rel=1e-6)
    # rank loss off by default (reference computes but never adds it)
    assert "rank_loss_0" not in aux
    loss2, aux2 = L.total_loss(scores, labels, None, rank_weight=1.0)
    assert "rank_loss_0" in aux2
