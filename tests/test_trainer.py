"""End-to-end trainer smoke: tiny SimpleVQA on synthetic videos.

Covers: dataset -> loader -> jit train step (loss/grads/AdamW/EMA) ->
eval (clip mean, rescale, metrics) -> best-checkpoint save -> output.txt.
"""

import os

import numpy as np
import pytest

from kvq_tpu.data.datasets import make_synthetic_opt
from kvq_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow  # model-assembly/e2e: minutes on small hosts

SAMPLE_TYPES = {
    "simpleVQA": dict(
        resize=48, crop=32, clip_len=4, frame_interval=2, t_frag=4, num_clips=1
    )
}


def tiny_config(tmp_path):
    data_opt = make_synthetic_opt(
        n_videos=6, n_frames=60, height=72, width=96,
        sample_types=SAMPLE_TYPES, phase="train", with_features=True,
    )
    val_opt = make_synthetic_opt(
        n_videos=4, n_frames=60, height=72, width=96,
        sample_types=SAMPLE_TYPES, phase="test", with_features=True,
    )
    return {
        "name": "tiny",
        "num_epochs": 2,
        "l_num_epochs": 0,
        "warmup_epochs": 0.5,
        "ema": True,
        "save_model": True,
        "batch_size": 3,
        "num_workers": 2,
        "seed": 0,
        "load_path": None,
        "data": {
            "train": {"type": "SimpleVQADataset", "args": data_opt},
            "val": {"type": "SimpleVQADataset", "args": val_opt},
        },
        "model": {
            "type": "simpleVQA",
            "compute_dtype": "float32",
            "args": {
                "simpleVQA": {
                    "backbone": {"layers": [1, 1, 1, 1]},
                    "head": {"hidden_channels": 16},
                }
            },
        },
        "optimizer": {"lr": 1e-3, "backbone_lr_mult": 1.0, "wd": 0.05},
    }


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    import jax

    workdir = str(tmp_path_factory.mktemp("work"))
    cfg = tiny_config(workdir)
    tr = Trainer(cfg, workdir=workdir)
    tr.build_datasets()
    sample = next(tr.train_loader.epoch(0))
    tr.build_models(sample)
    losses = []
    for epoch in range(2):
        for batch in tr.train_loader.epoch(epoch):
            from kvq_tpu.train.trainer import array_batch

            tr.state, aux = tr._train_step(
                tr.state, array_batch(batch), jax.random.key(epoch)
            )
            losses.append(float(aux["total_loss"]))
    return tr, losses, workdir


def test_train_step_runs_and_loss_finite(trained):
    tr, losses, _ = trained
    assert len(losses) == 4  # 6 videos / batch 3 = 2 steps x 2 epochs
    assert all(np.isfinite(l) for l in losses)
    assert int(tr.state.step) == 4


def test_ema_tracks_params(trained):
    import jax

    tr, _, _ = trained
    # EMA must differ from params (lagging) but not be the init value
    diff = jax.tree_util.tree_map(
        lambda p, e: float(np.abs(np.asarray(p) - np.asarray(e)).max()),
        tr.state.params,
        tr.state.ema_params,
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_eval_and_best_checkpoint(trained):
    tr, _, workdir = trained
    m = tr.evaluate()
    assert np.isfinite(m.srcc) and np.isfinite(m.rmse)
    best = tr._eval_and_maybe_save(False, (-1, -1, -1, 1999), "n")
    assert best[0] == m.srcc
    path = os.path.join(workdir, "tiny_head_val_n_finetuned.msgpack")
    assert os.path.exists(path)


def test_inference_test_writes_output(trained, tmp_path):
    tr, _, _ = trained
    out = str(tmp_path / "output.txt")
    results = tr.inference_test(out)
    assert len(results) == 4
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 4
    name, score = lines[0].split(",")
    float(score)  # parses


def test_checkpoint_roundtrip(trained, tmp_path):
    from kvq_tpu.core import checkpoint as ckpt

    tr, _, _ = trained
    path = str(tmp_path / "state.msgpack")
    ckpt.save_checkpoint(path, {"params": tr.state.params})
    loaded = ckpt.load_checkpoint(path)
    merged, report = ckpt.merge_params(tr.state.params, loaded["params"])
    assert not report["missing"] and not report["unexpected"]


def test_lr_schedule_matches_reference_lambda():
    import math

    from kvq_tpu.train.optim import warmup_cosine_schedule

    sched = warmup_cosine_schedule(1e-3, warmup_iters=10, max_iters=100)
    # warmup: cur/warmup * lr
    assert float(sched(5)) == pytest.approx(5 / 10 * 1e-3)
    assert float(sched(10)) == pytest.approx(1e-3)
    # cosine after warmup: 0.5*(1+cos(pi*(t-w)/max))*lr
    expected = 0.5 * (1 + math.cos(math.pi * (50 - 10) / 100)) * 1e-3
    assert float(sched(50)) == pytest.approx(expected, rel=1e-6)


def test_trainer_ksvqe_train_step_uses_qrs_rng(tmp_path):
    """Regression: Trainer._train_step must provide the 'qrs' rng stream —
    KSVQE's perturbed top-k draws from it at train time (nn/ksvqe.py:215)."""
    import jax
    import jax.numpy as jnp

    from kvq_tpu.train.trainer import TrainState, array_batch

    ksvqe_types = {
        "technical": dict(
            fragments_h=5, fragments_w=5, fsize_h=8, fsize_w=8,
            size_h=32, size_w=32, aligned=8,
            clip_len=8, frame_interval=1, num_clips=1,
        )
    }
    data_opt = make_synthetic_opt(
        n_videos=4, n_frames=40, height=48, width=64,
        sample_types=ksvqe_types, phase="train",
    )
    config = {
        "name": "tiny_ksvqe",
        "num_epochs": 1,
        "l_num_epochs": 0,
        "warmup_epochs": 0.5,
        "ema": False,
        "save_model": False,
        "batch_size": 2,
        "num_workers": 0,
        "seed": 0,
        "load_path": None,
        "data": {"train": {"type": "KVQDataset", "args": data_opt},
                 "val": {"type": "KVQDataset", "args": data_opt}},
        "model": {
            "type": "KSVQE",
            "compute_dtype": "float32",
            "args": {
                "KSVQE": {
                    "backbone": {
                        "num_samples": 2,
                        "sample_type": "topkpertubation",
                        "CLIP_location": 8,
                        "cls_use": True,
                        "tuning_stage": 1,
                        "a1": 1,
                        "a2": 2,
                        "checkpoint": False,
                        "anchor_size": 8,
                        "region_k": 9,
                        "embed_dim": 16,
                        "depths": [1, 1],
                        "num_heads": [2, 2],
                        "window_size": [2, 7, 7],
                        "contrique_layers": [1, 1, 1, 1],
                        "clip_layers": 2,
                        "clip_width": 64,
                        "clip_heads": 4,
                    },
                    "head": {"hidden_channels": 16},
                }
            },
        },
        "optimizer": {"lr": 1e-4, "backbone_lr_mult": 1.0, "wd": 0.05},
    }
    tr = Trainer(config, workdir=str(tmp_path))
    tr.build_datasets()
    sample = array_batch(next(iter(tr.train_loader)))
    tr.build_models(sample)
    state, aux = tr._train_step(tr.state, sample, jax.random.key(7))
    assert np.isfinite(float(aux["total_loss"]))
    assert int(state.step) == 1


def test_trainer_bridges_s2d_flag_to_loader(tmp_path):
    """``s2d_input: true`` in the model backbone config must make the
    Trainer ship packed fragments (data/fragments.py:s2d_pack) from BOTH
    loaders and train on them (trainer.py build_datasets bridge)."""
    import jax

    from kvq_tpu.train.trainer import array_batch

    ksvqe_types = {
        "technical": dict(
            fragments_h=5, fragments_w=5, fsize_h=8, fsize_w=8,
            size_h=32, size_w=32, aligned=8,
            clip_len=8, frame_interval=1, num_clips=1,
        )
    }
    data_opt = make_synthetic_opt(
        n_videos=4, n_frames=40, height=48, width=64,
        sample_types=ksvqe_types, phase="train",
    )
    config = {
        "name": "tiny_ksvqe_s2d",
        "num_epochs": 1,
        "l_num_epochs": 0,
        "warmup_epochs": 0.5,
        "ema": False,
        "save_model": False,
        "batch_size": 2,
        "num_workers": 0,
        "seed": 0,
        "load_path": None,
        "data": {"train": {"type": "KVQDataset", "args": dict(data_opt)},
                 "val": {"type": "KVQDataset", "args": dict(data_opt)}},
        "model": {
            "type": "KSVQE",
            "compute_dtype": "float32",
            "args": {
                "KSVQE": {
                    "backbone": {
                        "num_samples": 2,
                        "sample_type": "topkpertubation",
                        "CLIP_location": 8,
                        "cls_use": True,
                        "tuning_stage": 1,
                        "a1": 1,
                        "a2": 2,
                        "checkpoint": False,
                        "s2d_input": True,
                        "anchor_size": 8,
                        "region_k": 9,
                        "embed_dim": 16,
                        "depths": [1, 1],
                        "num_heads": [2, 2],
                        "window_size": [2, 7, 7],
                        "contrique_layers": [1, 1, 1, 1],
                        "clip_layers": 2,
                        "clip_width": 64,
                        "clip_heads": 4,
                    },
                    "head": {"hidden_channels": 16},
                }
            },
        },
        "optimizer": {"lr": 1e-4, "backbone_lr_mult": 1.0, "wd": 0.05},
    }
    tr = Trainer(config, workdir=str(tmp_path))
    tr.build_datasets()
    sample = array_batch(next(iter(tr.train_loader)))
    # (B, T/2, H/4, W/4, 96): 8-frame 40x40 fragment -> (2, 4, 10, 10, 96)
    assert sample["fragment"].shape == (2, 4, 10, 10, 96)
    val_batch = next(iter(tr.val_loader))
    assert np.asarray(val_batch["fragment"]).shape[1:] == (4, 10, 10, 96)
    tr.build_models(sample)
    state, aux = tr._train_step(tr.state, sample, jax.random.key(7))
    assert np.isfinite(float(aux["total_loss"]))
    assert int(state.step) == 1


def test_load_path_merges_params_and_batch_stats(tmp_path):
    """Converted torch checkpoints carry frozen-BN running stats — both
    trees must merge into the built model (trainer.py build_models)."""
    import jax
    import jax.numpy as jnp

    from kvq_tpu.core import checkpoint as ckpt

    cfg = tiny_config(tmp_path)
    t0 = Trainer(cfg, workdir=str(tmp_path / "w0"), test_set="val")
    t0.build_datasets()
    sample = next(t0.train_loader.epoch(0))
    t0.build_models(sample, seed=0)

    # craft a checkpoint with recognizable values
    marked_params = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, 0.125), t0.state.params
    )
    marked_stats = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, 0.25), t0.state.batch_stats
    )
    path = str(tmp_path / "conv.ckpt")
    ckpt.save_checkpoint(
        path, {"params": marked_params, "batch_stats": marked_stats}
    )

    cfg2 = dict(cfg, load_path=path)
    t1 = Trainer(cfg2, workdir=str(tmp_path / "w1"), test_set="val")
    t1.build_datasets()
    t1.build_models(next(t1.train_loader.epoch(0)), seed=0)
    leaf_p = jax.tree_util.tree_leaves(t1.state.params)[0]
    leaf_s = jax.tree_util.tree_leaves(t1.state.batch_stats)[0]
    assert float(np.ravel(leaf_p)[0]) == 0.125
    assert float(np.ravel(leaf_s)[0]) == 0.25


def test_bf16_h2d_views_identical_scores(tmp_path):
    """Pre-casting image views to bf16 on the host (h2d_dtype) must give
    BITWISE-identical eval scores to shipping f32 — the bf16-compute
    model's first op on each view is the same cast (trainer.py
    VIEW_CAST_KEYS; halves H2D bytes on the serving path)."""
    import jax.numpy as jnp

    from kvq_tpu.data.datasets import make_synthetic_opt

    st = {"technical": dict(
        fragments_h=5, fragments_w=5, fsize_h=8, fsize_w=8,
        size_h=32, size_w=32, aligned=4, clip_len=8, frame_interval=2,
        num_clips=1,
    )}
    val_opt = make_synthetic_opt(
        n_videos=4, n_frames=24, height=72, width=96, sample_types=st,
        phase="test",
    )
    base = {
        "name": "h2d", "num_epochs": 1, "warmup_epochs": 0, "ema": False,
        "save_model": False, "batch_size": 2, "num_workers": 0, "seed": 0,
        "load_path": None,
        "data": {"val": {"type": "KVQDataset", "args": val_opt}},
        "model": {"type": "KSVQE", "compute_dtype": "bfloat16", "args": {
            "KSVQE": {"backbone": {
                "num_samples": 2, "sample_type": "topkpertubation",
                "CLIP_location": 1, "cls_use": True, "tuning_stage": 1,
                "a1": 1, "a2": 2, "checkpoint": False, "use_pallas": False,
                "anchor_size": 8, "region_k": 9, "embed_dim": 16,
                "depths": [1, 1], "num_heads": [2, 2],
                "window_size": [2, 7, 7], "contrique_layers": [1, 1, 1, 1],
                "clip_layers": 2, "clip_width": 64, "clip_heads": 4,
            }, "head": {"hidden_channels": 16}}}},
        "optimizer": {"lr": 3e-5, "wd": 0.05},
    }
    scores = {}
    for h2d in ("bfloat16", "float32"):
        cfg = dict(base, h2d_dtype=h2d)
        tr = Trainer(cfg, workdir=str(tmp_path / h2d))
        assert (tr._view_dtype is None) == (h2d == "float32")
        tr.build_datasets()
        sample = next(tr.val_loader.epoch(0))
        tr.build_models(sample, seed=0)
        preds = []
        for batch, n, (p, gidx, glab) in tr._eval_batches(tr.state.params):
            preds.extend(np.asarray(p[:n], np.float64).tolist())
        scores[h2d] = preds
    np.testing.assert_array_equal(scores["bfloat16"], scores["float32"])
