import numpy as np
import pytest
from scipy.stats import kendalltau, pearsonr, spearmanr

from kvq_tpu.core import metrics as M


def test_rescale_matches_reference_semantics():
    pr = np.array([1.0, 2.0, 3.0, 4.0])
    gt = np.array([10.0, 20.0, 20.0, 50.0])
    out = M.rescale(pr, gt)
    # z-score then match label mean/std (reference trainer.py:356-361)
    expected = (pr - pr.mean()) / pr.std() * gt.std() + gt.mean()
    np.testing.assert_allclose(out, expected)
    np.testing.assert_allclose(out.mean(), gt.mean())
    np.testing.assert_allclose(out.std(), gt.std())


def test_rescale_no_gt_is_zscore():
    pr = np.array([5.0, 7.0, 9.0])
    out = M.rescale(pr)
    np.testing.assert_allclose(out.mean(), 0, atol=1e-12)
    np.testing.assert_allclose(out.std(), 1, atol=1e-12)


def test_vqa_metrics_against_scipy():
    rng = np.random.default_rng(0)
    labels = rng.normal(size=50)
    preds = labels + rng.normal(scale=0.3, size=50)
    m = M.vqa_metrics(labels, preds)
    rescaled = M.rescale(preds, labels)
    assert m.srcc == pytest.approx(spearmanr(labels, preds)[0])
    assert m.plcc == pytest.approx(pearsonr(labels, rescaled)[0])
    assert m.krcc == pytest.approx(kendalltau(labels, preds)[0])
    assert m.rmse == pytest.approx(np.sqrt(((labels - rescaled) ** 2).mean()))


def test_perfect_prediction():
    labels = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    m = M.vqa_metrics(labels, labels * 2 + 3)  # monotone affine
    assert m.srcc == pytest.approx(1.0)
    assert m.plcc == pytest.approx(1.0)
    assert m.krcc == pytest.approx(1.0)
    assert m.rmse == pytest.approx(0.0, abs=1e-9)


def test_challenge_score_formula():
    # 0.45*S + 0.45*P + 0.05*a_ns + 0.05*a_s (reference metric_score.py:45)
    assert M.challenge_score(1, 1, 1, 1) == pytest.approx(1.0)
    assert M.challenge_score(0.8, 0.6, 0.5, 0.7) == pytest.approx(
        0.45 * 0.8 + 0.45 * 0.6 + 0.05 * 0.5 + 0.05 * 0.7
    )


def test_pairwise_rank_accuracy():
    scores = {"a": 3.0, "b": 2.0, "c": 1.0}
    pairs = [("a", "b"), ("b", "c"), ("c", "a")]  # last is wrongly ordered
    acc = M.pairwise_rank_accuracy(scores, pairs)
    assert acc == pytest.approx(2 / 3)
    # missing videos are skipped, not counted wrong
    acc2 = M.pairwise_rank_accuracy(scores, [("a", "b"), ("x", "y")])
    assert acc2 == pytest.approx(1.0)


def test_score_prediction_file_with_rank_pair_csv_dir(tmp_path):
    """Rank-pair accuracy terms via the CSV-directory fallback (the xlsx
    path needs openpyxl, absent in this image)."""
    import pandas as pd

    from kvq_tpu.core.metrics import score_prediction_file

    names = [f"v{i}.mp4" for i in range(6)]
    truth = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    pred = [1.1, 2.2, 2.9, 4.4, 4.9, 6.2]
    pd.DataFrame({"filename": names, "score": pred}).to_csv(
        tmp_path / "pred.csv", index=False
    )
    pd.DataFrame({"filename": names, "score": truth}).to_csv(
        tmp_path / "truth.csv", index=False
    )
    rp = tmp_path / "pairs"
    rp.mkdir()
    # nonsource: all ordered correctly by pred; source: one inversion
    pd.DataFrame({"better": [names[5], names[3]],
                  "worse": [names[0], names[1]]}).to_csv(
        rp / "nonsource.csv", index=False
    )
    pd.DataFrame({"better": [names[1], names[2]],
                  "worse": [names[0], names[3]]}).to_csv(
        rp / "source.csv", index=False
    )
    out = score_prediction_file(
        str(tmp_path / "pred.csv"), str(tmp_path / "truth.csv"), str(rp)
    )
    assert out["acc_nonsource"] == 1.0
    assert out["acc_source"] == 0.5
    assert 0.9 < out["srcc"] <= 1.0
    assert out["score"] > 0.8


def test_count_params_and_flops_estimate():
    import jax.numpy as jnp

    from kvq_tpu.core.logging import count_params, flops_estimate

    p = {"a": jnp.ones((3, 4)), "b": {"c": jnp.ones((5,))}}
    assert count_params(p) == 17
    f = flops_estimate(lambda x: x @ x, jnp.ones((64, 64)))
    # XLA reports 2*64^3 for a 64x64 matmul (None allowed on exotic backends)
    assert f is None or f == 2 * 64**3
