"""Trainer end-to-end over the virtual 8-device mesh (DDP path)."""

import numpy as np

from kvq_tpu.data.datasets import make_synthetic_opt
from kvq_tpu.parallel.mesh import make_mesh
from kvq_tpu.train.trainer import Trainer

import pytest

pytestmark = pytest.mark.slow  # model-assembly/e2e: minutes on small hosts

SAMPLE_TYPES = {
    "simpleVQA": dict(
        resize=48, crop=32, clip_len=4, frame_interval=2, t_frag=4, num_clips=1
    )
}


def test_trainer_ddp_epoch_and_eval():
    import jax

    data_opt = make_synthetic_opt(
        n_videos=8, n_frames=60, height=72, width=96,
        sample_types=SAMPLE_TYPES, phase="train", with_features=True,
    )
    val_opt = make_synthetic_opt(
        n_videos=2, n_frames=60, height=72, width=96,
        sample_types=SAMPLE_TYPES, phase="test", with_features=True,
    )
    cfg = {
        "name": "meshed",
        "num_epochs": 1,
        "warmup_epochs": 0,
        "ema": True,
        "save_model": False,
        "batch_size": 8,  # 2 per shard on a 4-way data mesh
        "num_workers": 2,
        "seed": 0,
        "ddp": True,
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
                    "head": {"hidden_channels": 8},
                }
            },
        },
        "optimizer": {"lr": 1e-3, "wd": 0.01},
    }
    mesh = make_mesh(data=4, fsdp=2)
    tr = Trainer(cfg, workdir="/tmp/meshwork", mesh=mesh)
    tr.build_datasets()
    sample = next(tr.train_loader.epoch(0))
    tr.build_models(sample)
    aux = tr.train_epoch(0, jax.random.key(0))
    assert np.isfinite(aux["total_loss"])
    assert int(tr.state.step) == 1  # 8 videos / batch 8
    m = tr.evaluate()
    assert np.isfinite(m.srcc) or len(tr.val_loader.dataset) < 3


def test_trainer_ddp_bf16_views():
    """bf16-compute model on the mesh: image views ship as bf16 (trainer
    view_dtype) and the sharded placement (make_array_from_process_local
    data with ml_dtypes bf16) must train + eval finite."""
    import jax
    import jax.numpy as jnp

    data_opt = make_synthetic_opt(
        n_videos=8, n_frames=40, height=72, width=96,
        sample_types=SAMPLE_TYPES, phase="train", with_features=True,
    )
    val_opt = make_synthetic_opt(
        n_videos=2, n_frames=40, height=72, width=96,
        sample_types=SAMPLE_TYPES, phase="test", with_features=True,
    )
    cfg = {
        "name": "meshed_bf16",
        "num_epochs": 1,
        "warmup_epochs": 0,
        "ema": False,
        "save_model": False,
        "batch_size": 8,
        "num_workers": 0,
        "seed": 0,
        "ddp": True,
        "load_path": None,
        "data": {
            "train": {"type": "SimpleVQADataset", "args": data_opt},
            "val": {"type": "SimpleVQADataset", "args": val_opt},
        },
        "model": {
            "type": "simpleVQA",
            "compute_dtype": "bfloat16",
            "args": {
                "simpleVQA": {
                    "backbone": {"layers": [1, 1, 1, 1]},
                    "head": {"hidden_channels": 8},
                }
            },
        },
        "optimizer": {"lr": 1e-3, "wd": 0.01},
    }
    mesh = make_mesh(data=4, fsdp=2)
    tr = Trainer(cfg, workdir="/tmp/meshwork_bf16", mesh=mesh)
    assert tr._view_dtype == jnp.bfloat16
    tr.build_datasets()
    sample = next(tr.train_loader.epoch(0))
    tr.build_models(sample)
    aux = tr.train_epoch(0, jax.random.key(0))
    assert np.isfinite(aux["total_loss"])
    m = tr.evaluate()
    # 2 val videos: correlations may be degenerate but must not be NaN
    # from the bf16 sharded path itself
    assert np.isfinite(m.rmse)
