"""Inference CLI — *working* counterpart of reference test.py (which calls
a nonexistent ``Trainer.inferece``, SURVEY.md §5.1.1).

    python -m kvq_tpu.cli.test -o config/Kwai_KSVQE_test.yml \
        [-out output.txt] [--csv prediction.csv]

Writes ``video_name,score`` lines (reference trainer_ddp.py:316-352) and,
with --csv, a metric_score.py-compatible prediction CSV with a header.
"""

from __future__ import annotations

import argparse

from ..core.config import load_config
from ..train.trainer import Trainer


def parse_args(argv=None):
    p = argparse.ArgumentParser("kvq_tpu test")
    p.add_argument("-o", "--opt", required=True)
    p.add_argument("-t", "--test_set", default="test")
    p.add_argument("--gpu_id", default="0", help="ignored (torch compat)")
    p.add_argument("-out", "--output", default="output.txt")
    p.add_argument("--csv", default=None, help="also write prediction csv")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    config = load_config(args.opt)
    # test entry loads test_load_path (reference config key)
    if config.get("test_load_path"):
        config["load_path"] = config["test_load_path"]

    trainer = Trainer(config, test_set=args.test_set)
    trainer.build_datasets()
    assert trainer.val_loader is not None, "config needs data.val"
    sample = next(trainer.val_loader.epoch(0))
    trainer.build_models(sample)
    results = trainer.inference_test(args.output)
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("filename,score\n")
            for name, score in results:
                f.write(f"{name},{score}\n")
    print(f"wrote {len(results)} predictions to {args.output}")
    return results


if __name__ == "__main__":
    main()
