"""CLI end-to-end: train one epoch + test inference on real tiny mp4s
through the actual command-line entry points."""

import os

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # model-assembly/e2e: minutes on small hosts

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def tiny_project(tmp_path_factory):
    root = tmp_path_factory.mktemp("proj")
    vids = root / "videos"
    feats = root / "feat"
    vids.mkdir()
    feats.mkdir()
    names = []
    for i in range(4):
        name = f"v{i}.mp4"
        w = cv2.VideoWriter(
            str(vids / name), cv2.VideoWriter_fourcc(*"mp4v"), 30, (96, 72)
        )
        for t in range(60):
            frame = np.full((72, 96, 3), (t * (i + 1)) % 255, np.uint8)
            w.write(frame)
        w.release()
        fdir = feats / name
        fdir.mkdir()
        for k in range(4):
            np.save(fdir / f"feature_{k}_slow_feature.npy",
                    np.random.default_rng(i).normal(size=2048).astype(np.float32))
            np.save(fdir / f"feature_{k}_fast_feature.npy",
                    np.random.default_rng(i).normal(size=256).astype(np.float32))
        names.append(name)

    for split in ("train", "val"):
        with open(root / f"{split}.csv", "w") as f:
            f.write("filename,score\n")
            for i, n in enumerate(names):
                f.write(f"{n},{1.0 + i}\n")

    cfg = {
        "name": "clitiny",
        "num_epochs": 1,
        "warmup_epochs": 0,
        "ema": True,
        "save_model": True,
        "batch_size": 2,
        "num_workers": 2,
        "data": {
            split: {
                "type": "ViewDecompositionDataset_add_forSimpleVQA",
                "args": {
                    "phase": "train" if split == "train" else "test",
                    "anno_file": str(root / f"{split}.csv"),
                    "data_prefix": str(vids),
                    "data_prefix_3D": str(feats),
                    "feature_type": "SlowFast",
                    "sample_types": {
                        "simpleVQA": {
                            "resize": 48,
                            "crop": 32,
                            "clip_len": 4,
                            "frame_interval": 2,
                            "t_frag": 4,
                            "num_clips": 1,
                        }
                    },
                },
            }
            for split in ("train", "val")
        },
        "model": {
            "type": "simpleVQA",
            "compute_dtype": "float32",
            "args": {
                "simpleVQA": {
                    "backbone": {"layers": [1, 1, 1, 1]},
                    "head": {"hidden_channels": 8},
                }
            },
        },
        "optimizer": {"lr": 1e-3, "wd": 0.01},
        "load_path": None,
        "test_load_path": None,
    }
    cfg_path = root / "cfg.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return root, str(cfg_path)


def test_cli_train_one_epoch(tiny_project):
    from kvq_tpu.cli.train import main

    root, cfg_path = tiny_project
    work = str(root / "work")
    best, best_ema = main(
        ["-o", cfg_path, "-t", "val", "-r", work, "--epochs", "1"]
    )
    assert np.isfinite(best[3])  # rmse computed
    # reference VIDEO_LENGTH_READ quirk: dataset loads 8 features but
    # clip_len=4 here -> SimpleVQADataset must still produce matching dims
    ckpts = os.listdir(work)
    assert any(c.endswith("_finetuned.msgpack") for c in ckpts)


def test_cli_test_inference(tiny_project, tmp_path):
    from kvq_tpu.cli.test import main

    root, cfg_path = tiny_project
    out = str(tmp_path / "output.txt")
    csv_out = str(tmp_path / "prediction.csv")
    results = main(["-o", cfg_path, "-out", out, "--csv", csv_out])
    assert len(results) == 4
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 4
    assert open(csv_out).readline().strip() == "filename,score"


def test_cli_metric_score(tiny_project, tmp_path):
    from kvq_tpu.cli.metric_score import main

    pred = tmp_path / "pred.csv"
    truth = tmp_path / "truth.csv"
    pred.write_text(
        "filename,score\na.mp4,0.1\nb.mp4,0.5\nc.mp4,0.3\nd.mp4,0.9\n"
    )
    truth.write_text(
        "filename,score\na.mp4,1.0\nb.mp4,3.0\nc.mp4,2.0\nd.mp4,4.0\n"
    )
    result = main(["--pred", str(pred), "--truth", str(truth)])
    assert result["srcc"] == pytest.approx(1.0)
    assert result["score"] == pytest.approx(0.45 * result["srcc"] + 0.45 * result["plcc"])


def test_convert_cli_contrique(tmp_path):
    import numpy as np
    import torch

    from kvq_tpu.cli.convert import main as convert_main
    from kvq_tpu.core.checkpoint import load_checkpoint

    # minimal CONTRIQUE-shaped torch checkpoint: Sequential encoder
    # (conv1, bn1, <skip>, <skip>, layer1) + projector
    sd = {}
    sd["encoder.0.weight"] = torch.randn(8, 3, 7, 7)
    for k, shape in [("weight", (8,)), ("bias", (8,)),
                     ("running_mean", (8,)), ("running_var", (8,))]:
        sd[f"encoder.1.{k}"] = torch.randn(shape)
    # one bottleneck block in layer1 (encoder position 4)
    for ci, (o, i) in enumerate([(4, 8), (4, 4), (16, 4)], start=1):
        sd[f"encoder.4.0.conv{ci}.weight"] = torch.randn(o, i, 1, 1)
        for k in ("weight", "bias", "running_mean", "running_var"):
            sd[f"encoder.4.0.bn{ci}.{k}"] = torch.randn(o)
    sd["encoder.4.0.downsample.0.weight"] = torch.randn(16, 8, 1, 1)
    for k in ("weight", "bias", "running_mean", "running_var"):
        sd[f"encoder.4.0.downsample.1.{k}"] = torch.randn(16)
    sd["projector.0.weight"] = torch.randn(16, 16)
    for k in ("weight", "bias", "running_mean", "running_var"):
        sd[f"projector.1.{k}"] = torch.randn(16)
    sd["projector.3.weight"] = torch.randn(4, 16)
    for k in ("weight", "bias", "running_mean", "running_var"):
        sd[f"projector.4.{k}"] = torch.randn(4)

    src = tmp_path / "contrique.tar"
    out = tmp_path / "contrique.ckpt"
    torch.save({"state_dict": sd}, src)
    convert_main(["--kind", "contrique", "--src", str(src), "--out", str(out)])

    state = load_checkpoint(str(out))
    p, s = state["params"], state["batch_stats"]
    assert p["encoder"]["stem"]["conv1"]["kernel"].shape == (7, 7, 3, 8)
    assert p["projector_fc2"]["kernel"].shape == (16, 4)
    np.testing.assert_allclose(
        s["projector_bn2"]["mean"], sd["projector.4.running_mean"].numpy()
    )
