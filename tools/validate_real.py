#!/usr/bin/env python
"""Turnkey real-data validation: convert -> inference -> metric_score ->
SRCC-delta report (VERDICT r4 #8).

One command that, the day KVQ data and reference checkpoints are
available, checks the accuracy north-star (SRCC/PLCC within 0.002 of the
reference, BASELINE.md) end to end::

    python tools/validate_real.py \
        --opt config/Kwai_KSVQE.yml \
        --ckpt KSVQE_techniqual_pretrainonLSVQ.pth --kind ksvqe \
        --truth truth.csv [--rank_pairs rank-pair-val.xlsx] \
        [--expect_srcc 0.867 --expect_plcc 0.869] [--tol 0.002]

Torch checkpoints (.pth/.pt/.tar) are converted to msgpack first
(cli/convert); msgpack checkpoints are used directly.  The config's
data.val must point at the real annotation file + videos.  Prints ONE
JSON line with the metrics, the deltas, and pass/fail; exit code 1 on a
failed expectation.  Reference chain: trainer.py:217-220 (metrics),
metric_score.py:45 (challenge score).

Smoke-tested hermetically on synthetic fixture videos by
tests/test_validate_real.py.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")


def parse_args(argv=None):
    p = argparse.ArgumentParser("kvq_tpu validate_real")
    p.add_argument("--opt", required=True, help="config yml (data.val = real KVQ val)")
    p.add_argument("--ckpt", required=True,
                   help="checkpoint: torch .pth/.pt/.tar (converted) or msgpack")
    p.add_argument("--kind", default="ksvqe",
                   help="convert kind for torch checkpoints (cli/convert)")
    p.add_argument("--truth", required=True, help="truth CSV (filename,score)")
    p.add_argument("--rank_pairs", default=None,
                   help="rank-pair xlsx (or dir with nonsource.csv/source.csv)")
    p.add_argument("--expect_srcc", type=float, default=None)
    p.add_argument("--expect_plcc", type=float, default=None)
    p.add_argument("--tol", type=float, default=0.002,
                   help="max |measured - expected| (BASELINE.md north star)")
    p.add_argument("--workdir", default="/tmp/kvq_validate_real")
    return p.parse_args(argv)


def run(args) -> dict:
    from kvq_tpu.core.config import load_config
    from kvq_tpu.core.metrics import score_prediction_file
    from kvq_tpu.train.trainer import Trainer

    os.makedirs(args.workdir, exist_ok=True)
    ckpt_path = args.ckpt
    if ckpt_path.endswith((".pth", ".pt", ".tar")):
        from kvq_tpu.cli import convert as cvt

        out = os.path.join(args.workdir, "converted.msgpack")
        state = cvt.convert(args.kind, ckpt_path)
        from kvq_tpu.core import checkpoint as ckpt

        ckpt.save_checkpoint(out, state)
        ckpt_path = out

    config = load_config(args.opt) if isinstance(args.opt, str) else args.opt
    config["load_path"] = ckpt_path
    config.setdefault("save_model", False)

    tr = Trainer(config, workdir=args.workdir)
    tr.build_datasets()
    assert tr.val_loader is not None, "config needs data.val"
    sample = next(tr.val_loader.epoch(0))
    tr.build_models(sample)
    out_txt = os.path.join(args.workdir, "output.txt")
    results = tr.inference_test(out_txt)
    pred_csv = os.path.join(args.workdir, "prediction.csv")
    with open(pred_csv, "w") as f:
        f.write("filename,score\n")
        for name, score in results:
            f.write(f"{name},{score}\n")

    metrics = score_prediction_file(pred_csv, args.truth, args.rank_pairs)
    report = {
        "n_videos": len(results),
        "prediction_csv": pred_csv,
        "metrics": metrics,
        "passed": True,
    }
    for key, expected in (("srcc", args.expect_srcc),
                          ("plcc", args.expect_plcc)):
        if expected is None:
            continue
        delta = abs(metrics[key] - expected)
        report[f"{key}_expected"] = expected
        report[f"{key}_delta"] = round(delta, 5)
        if delta > args.tol:
            report["passed"] = False
    return report


def main(argv=None):
    args = parse_args(argv)
    report = run(args)
    print(json.dumps(report))
    return 0 if report["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
