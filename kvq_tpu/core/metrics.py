"""Quality-assessment metrics.

Parity targets:
  - SRCC/PLCC/KRCC/RMSE with z-score rescale of predictions to the label
    distribution before computing, exactly as reference trainer.py:213-222
    and trainer.py:356-361 (``rescale``).
  - NTIRE challenge score
    ``0.45*SROCC + 0.45*PLCC + 0.05*acc_nonsource + 0.05*acc_source``
    (reference metric_score.py:45), including the ranked-pair accuracy terms
    from the rank-pair xlsx (metric_score.py:20-41).
"""

from __future__ import annotations

from typing import Iterable, Mapping, NamedTuple, Sequence

import numpy as np
from scipy.stats import kendalltau, pearsonr, spearmanr


class VQAMetrics(NamedTuple):
    srcc: float
    plcc: float
    krcc: float
    rmse: float


def rescale(pr: Sequence[float], gt: Sequence[float] | None = None) -> np.ndarray:
    """Z-score predictions; if labels given, match their mean/std.

    Exact semantics of reference trainer.py:356-361.
    """
    pr = np.asarray(pr, dtype=np.float64)
    if gt is None:
        return (pr - np.mean(pr)) / np.std(pr)
    gt = np.asarray(gt, dtype=np.float64)
    return ((pr - np.mean(pr)) / np.std(pr)) * np.std(gt) + np.mean(gt)


def vqa_metrics(
    labels: Sequence[float], preds: Sequence[float], do_rescale: bool = True
) -> VQAMetrics:
    """SRCC/PLCC/KRCC/RMSE on (rescaled) predictions.

    Mirrors reference trainer.py:213-220: predictions are rescaled to the
    label distribution *before* PLCC/RMSE (SRCC/KRCC are rescale-invariant).
    """
    labels = np.asarray(labels, dtype=np.float64)
    preds = np.asarray(preds, dtype=np.float64)
    if do_rescale:
        preds = rescale(preds, labels)
    s = spearmanr(labels, preds)[0]
    p = pearsonr(labels, preds)[0]
    k = kendalltau(labels, preds)[0]
    r = float(np.sqrt(((labels - preds) ** 2).mean()))
    return VQAMetrics(float(s), float(p), float(k), r)


def pairwise_rank_accuracy(
    scores: Mapping[str, float], ranked_pairs: Iterable[tuple[str, str]]
) -> float:
    """Fraction of (better, worse) pairs the scores order correctly.

    ``ranked_pairs`` yields (video_a, video_b) where a is annotated strictly
    better than b — the semantics of the reference's rank-pair xlsx sheets
    (metric_score.py:20-41: accuracy of ``score[a] > score[b]``).
    """
    total = 0
    correct = 0
    for a, b in ranked_pairs:
        if a not in scores or b not in scores:
            continue
        total += 1
        if scores[a] > scores[b]:
            correct += 1
    if total == 0:
        return 0.0
    return correct / total


def challenge_score(
    srcc: float,
    plcc: float,
    acc_nonsource: float = 0.0,
    acc_source: float = 0.0,
) -> float:
    """NTIRE 2024 KVQ final score (reference metric_score.py:45)."""
    return 0.45 * srcc + 0.45 * plcc + 0.05 * acc_nonsource + 0.05 * acc_source


def score_prediction_file(
    pred_csv: str,
    truth_csv: str,
    rank_pair_xlsx: str | None = None,
) -> dict:
    """Runnable version of the reference's CodaLab scoring fragment.

    The reference metric_score.py references undefined variables and cannot
    run standalone (SURVEY.md §5.1.4); this is the working equivalent.  Both
    CSVs must have columns ``filename,score`` (header row).  The optional
    xlsx has sheets ``nonsource``/``source`` with two filename columns per
    row, first strictly better than second.
    """
    import pandas as pd

    pred = pd.read_csv(pred_csv)
    truth = pd.read_csv(truth_csv)
    pred.columns = ["filename", "score"][: len(pred.columns)]
    truth.columns = ["filename", "score"][: len(truth.columns)]
    merged = pred.merge(truth, on="filename", suffixes=("_pred", "_true"))
    m = vqa_metrics(merged["score_true"], merged["score_pred"])

    acc_ns = acc_s = 0.0
    if rank_pair_xlsx is not None:
        import os.path as osp

        scores = dict(zip(pred["filename"], pred["score"]))
        for sheet, dest in (("nonsource", "ns"), ("source", "s")):
            if osp.isdir(rank_pair_xlsx):
                # CSV fallback: a directory holding nonsource.csv/source.csv
                # (two filename columns per row) — xlsx parsing needs
                # openpyxl, which not every deployment ships
                df = pd.read_csv(osp.join(rank_pair_xlsx, f"{sheet}.csv"))
            else:
                try:
                    df = pd.read_excel(rank_pair_xlsx, sheet_name=sheet)
                except ImportError as e:  # pragma: no cover
                    raise ImportError(
                        "reading the rank-pair xlsx needs openpyxl; "
                        "alternatively pass a directory with "
                        "nonsource.csv/source.csv"
                    ) from e
            pairs = list(zip(df.iloc[:, 0], df.iloc[:, 1]))
            acc = pairwise_rank_accuracy(scores, pairs)
            if dest == "ns":
                acc_ns = acc
            else:
                acc_s = acc

    return {
        "srcc": m.srcc,
        "plcc": m.plcc,
        "krcc": m.krcc,
        "rmse": m.rmse,
        "acc_nonsource": acc_ns,
        "acc_source": acc_s,
        "score": challenge_score(m.srcc, m.plcc, acc_ns, acc_s),
    }
