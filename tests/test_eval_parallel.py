"""Batched / meshed / multi-host-sharded evaluation must reproduce the
sequential batch-1 reference path exactly (VERDICT r1 items 2-3: the
reference shards validation across DDP ranks, trainer_ddp.py:144-156,
259-267; the rebuild batches videos and shards rows over the mesh)."""

import numpy as np
import pytest

from kvq_tpu.data.datasets import make_synthetic_opt
from kvq_tpu.data.pipeline import Loader
from kvq_tpu.parallel.mesh import make_mesh
from kvq_tpu.train.trainer import Trainer, pad_batch_rows

pytestmark = pytest.mark.slow  # model-assembly/e2e: minutes on small hosts

SAMPLE_TYPES = {
    "simpleVQA": dict(
        resize=48, crop=32, clip_len=4, frame_interval=2, t_frag=4, num_clips=1
    )
}


def tiny_cfg(n_val=5, eval_batch_size=None, ddp=False):
    val_opt = make_synthetic_opt(
        n_videos=n_val, n_frames=60, height=72, width=96,
        sample_types=SAMPLE_TYPES, phase="test", with_features=True,
    )
    cfg = {
        "name": "evalpar",
        "num_epochs": 1,
        "warmup_epochs": 0,
        "ema": False,
        "save_model": False,
        "batch_size": 2,
        "num_workers": 2,
        "seed": 0,
        "ddp": ddp,
        "load_path": None,
        "data": {"val": {"type": "SimpleVQADataset", "args": val_opt}},
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
    }
    if eval_batch_size is not None:
        cfg["eval_batch_size"] = eval_batch_size
    return cfg


def _eval_preds(cfg, mesh=None, seed=0):
    tr = Trainer(cfg, workdir="/tmp/evalparwork", mesh=mesh)
    tr.build_datasets()
    sample = next(tr.val_loader.epoch(0))
    tr.build_models(sample, seed=seed)
    preds, labels = [], []
    for batch in tr.val_loader.epoch(0):
        p, l = tr._eval_scores(tr.state.params, batch)
        preds.extend(p)
        labels.extend(l)
    return np.asarray(preds), np.asarray(labels)


def test_pad_batch_rows_repeats_last_row():
    batch = {
        "simpleVQA": np.arange(2 * 3).reshape(2, 3).astype(np.float32),
        "label": np.asarray([1.0, 2.0], np.float32),
        "video_name": ["a", "b"],
        "num_clips": 1,
    }
    out = pad_batch_rows(batch, 4)
    assert out["simpleVQA"].shape == (4, 3)
    np.testing.assert_array_equal(out["simpleVQA"][2], out["simpleVQA"][1])
    assert out["video_name"] == ["a", "b", "b", "b"]
    assert out["num_clips"] == 1
    # no-op when already full
    assert pad_batch_rows(batch, 2) is batch


def test_batched_eval_matches_sequential():
    p1, l1 = _eval_preds(tiny_cfg(n_val=5, eval_batch_size=1))
    p3, l3 = _eval_preds(tiny_cfg(n_val=5, eval_batch_size=3))
    assert p1.shape == p3.shape == (5,)
    np.testing.assert_allclose(np.sort(l1), np.sort(l3), rtol=0, atol=0)
    np.testing.assert_allclose(p1, p3, rtol=1e-5, atol=1e-5)


def test_evaluate_double_buffered_matches_sequential():
    """Trainer.evaluate pipelines dispatch/collect (two batches in
    flight); its metrics must equal the strictly-sequential per-batch
    path.  n_val=5 with eval_batch_size=2 leaves a padded final batch
    AND a non-empty pending queue to drain."""
    from kvq_tpu.core.metrics import vqa_metrics

    cfg = tiny_cfg(n_val=5, eval_batch_size=2)
    tr = Trainer(cfg, workdir="/tmp/evalparwork")
    tr.build_datasets()
    sample = next(tr.val_loader.epoch(0))
    tr.build_models(sample, seed=0)
    got = tr.evaluate()
    preds, labels = [], []
    for batch in tr.val_loader.epoch(0):
        p, l = tr._eval_scores(tr.state.params, batch)
        preds.extend(p)
        labels.extend(l)
    assert len(preds) == 5
    np.testing.assert_allclose(got, vqa_metrics(labels, preds), rtol=0, atol=0)


def test_mesh_eval_matches_single_device():
    p1, _ = _eval_preds(tiny_cfg(n_val=5, eval_batch_size=1))
    mesh = make_mesh(data=4, fsdp=2)
    # eval_batch_size defaults to mesh size (8): 5 videos -> 5 + 3 padded
    pm, _ = _eval_preds(tiny_cfg(n_val=5, ddp=True), mesh=mesh)
    assert pm.shape == (5,)
    np.testing.assert_allclose(p1, pm, rtol=1e-4, atol=1e-4)


def test_mesh_evaluate_dedupes_and_matches_local():
    """Full Trainer.evaluate on a mesh uses the tagged eval step (scores +
    dataset index + label, replicated) and dedupes padding duplicates;
    metrics must match the local-jit evaluate.  n_val=5 on an 8-way mesh
    pads 3 duplicate rows per batch."""
    cfg = tiny_cfg(n_val=5, eval_batch_size=2)
    tr = Trainer(cfg, workdir="/tmp/evalparwork")
    tr.build_datasets()
    sample = next(tr.val_loader.epoch(0))
    tr.build_models(sample, seed=0)
    ref = tr.evaluate()

    mesh = make_mesh(data=4, fsdp=2)
    trm = Trainer(tiny_cfg(n_val=5, ddp=True), workdir="/tmp/evalparwork",
                  mesh=mesh)
    trm.build_datasets()
    sample = next(trm.val_loader.epoch(0))
    trm.build_models(sample, seed=0)
    got = trm.evaluate()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_loader_shards_partition_dataset():
    opt = make_synthetic_opt(
        n_videos=7, n_frames=60, height=72, width=96,
        sample_types=SAMPLE_TYPES, phase="test", with_features=True,
    )
    from kvq_tpu.core.registry import DATASETS

    ds = DATASETS.get("SimpleVQADataset")(opt)
    names, per_shard = [], []
    for k in range(2):
        ld = Loader(ds, batch_size=2, shuffle=False, num_workers=1, shard=(k, 2))
        got = []
        for batch in ld.epoch(0):
            got.extend(batch["video_name"])
        per_shard.append(got)
        names.extend(got)
    # DistributedSampler parity: shards are EQUAL length (wrap-padded so
    # every host runs the same number of batches — per-batch collectives
    # would deadlock otherwise) and together cover the whole dataset
    assert len(per_shard[0]) == len(per_shard[1]) == 4
    assert len(names) == 8 and len(set(names)) == 7
