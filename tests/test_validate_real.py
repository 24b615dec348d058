"""Smoke for tools/validate_real.py (VERDICT r4 #8): the one-command
convert -> inference -> metric_score -> SRCC-delta chain runs end to end
on hermetic fixture videos and reports deltas/pass correctly."""

import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # builds a model + scores videos: ~minutes

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_validate_real_chain(tmp_path):
    cv2 = pytest.importorskip("cv2")  # noqa: F841 — fixture videos
    import yaml

    from tools.bench_pipeline import make_fixture_videos
    from tools.validate_real import parse_args, run

    root = str(tmp_path / "videos")
    names = make_fixture_videos(root, 4, frames=60, w=192, h=108)

    # 4-column reference TXT annotation (filename,cls,dis,score)
    anno = tmp_path / "val.txt"
    labels = [2.0, 3.0, 4.0, 5.0]
    anno.write_text("".join(
        f"{n},0,{i % 4},{labels[i]}\n" for i, n in enumerate(names)
    ))
    truth = tmp_path / "truth.csv"
    truth.write_text("filename,score\n" + "".join(
        f"{n},{labels[i]}\n" for i, n in enumerate(names)
    ))

    cfg = {
        "name": "validate_smoke",
        "num_epochs": 1,
        "warmup_epochs": 0,
        "ema": False,
        "save_model": False,
        "batch_size": 2,
        "num_workers": 0,
        "seed": 0,
        "load_path": None,
        "data": {"val": {"type": "KVQDataset", "args": {
            "anno_file": str(anno),
            "data_prefix": root,
            "phase": "test",
            "sample_types": {"technical": dict(
                fragments_h=5, fragments_w=5, fsize_h=8, fsize_w=8,
                size_h=32, size_w=32, aligned=4, clip_len=8,
                frame_interval=2, num_clips=1,
            )},
        }}},
        "model": {"type": "KSVQE", "compute_dtype": "float32", "args": {
            "KSVQE": {
                "backbone": {
                    "num_samples": 2, "sample_type": "topkpertubation",
                    "CLIP_location": 1, "cls_use": True, "tuning_stage": 1,
                    "a1": 1, "a2": 2, "checkpoint": False,
                    "use_pallas": False, "anchor_size": 8, "region_k": 9,
                    "embed_dim": 16, "depths": [1, 1], "num_heads": [2, 2],
                    "window_size": [2, 7, 7],
                    "contrique_layers": [1, 1, 1, 1], "clip_layers": 2,
                    "clip_width": 64, "clip_heads": 4,
                },
                "head": {"hidden_channels": 16},
            }}},
        "optimizer": {"lr": 3e-5, "wd": 0.05},
    }
    opt_path = tmp_path / "cfg.yml"
    opt_path.write_text(yaml.safe_dump(cfg))

    # a native msgpack checkpoint: init a model through the same Trainer
    # path and save it (the torch-convert arm is covered by test_cli.py)
    from kvq_tpu.core import checkpoint as ckpt
    from kvq_tpu.train.trainer import Trainer

    tr = Trainer(dict(cfg), workdir=str(tmp_path / "init"))
    tr.build_datasets()
    sample = next(tr.val_loader.epoch(0))
    tr.build_models(sample, seed=0)
    ckpt_path = str(tmp_path / "model.msgpack")
    ckpt.save_checkpoint(ckpt_path, {
        "params": tr.state.params, "batch_stats": tr.state.batch_stats,
    })

    args = parse_args([
        "--opt", str(opt_path), "--ckpt", ckpt_path,
        "--truth", str(truth), "--workdir", str(tmp_path / "wd"),
        "--expect_srcc", "2.0", "--tol", "0.002",
    ])
    report = run(args)

    assert report["n_videos"] == 4
    assert os.path.exists(report["prediction_csv"])
    m = report["metrics"]
    assert np.isfinite(m["srcc"]) and np.isfinite(m["plcc"])
    # expectation srcc=2.0 is unattainable -> the delta gate must fail
    assert report["srcc_delta"] > 0.002 and report["passed"] is False

    # self-consistent expectation passes
    args2 = parse_args([
        "--opt", str(opt_path), "--ckpt", ckpt_path,
        "--truth", str(truth), "--workdir", str(tmp_path / "wd2"),
        "--expect_srcc", str(m["srcc"]), "--expect_plcc", str(m["plcc"]),
    ])
    report2 = run(args2)
    assert report2["passed"] is True
    assert abs(report2["metrics"]["srcc"] - m["srcc"]) < 1e-9
    print(json.dumps(report2))
