"""Full-state save/resume (capability beyond the reference's params-only
checkpoints)."""

import numpy as np

from kvq_tpu.data.datasets import make_synthetic_opt
from kvq_tpu.train.trainer import Trainer

import pytest

pytestmark = pytest.mark.slow  # model-assembly/e2e: minutes on small hosts

SAMPLE_TYPES = {
    "simpleVQA": dict(
        resize=48, crop=32, clip_len=4, frame_interval=2, t_frag=4, num_clips=1
    )
}


def _make_trainer(workdir):
    data_opt = make_synthetic_opt(
        n_videos=4, n_frames=60, height=72, width=96,
        sample_types=SAMPLE_TYPES, phase="train", with_features=True,
    )
    cfg = {
        "name": "resume",
        "num_epochs": 1,
        "warmup_epochs": 0,
        "ema": True,
        "save_model": False,
        "batch_size": 2,
        "num_workers": 1,
        "seed": 0,
        "load_path": None,
        "data": {"train": {"type": "SimpleVQADataset", "args": data_opt}},
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
    tr = Trainer(cfg, workdir=workdir)
    tr.build_datasets()
    sample = next(tr.train_loader.epoch(0))
    tr.build_models(sample)
    return tr


def test_full_state_roundtrip(tmp_path):
    import jax

    tr = _make_trainer(str(tmp_path))
    tr.train_epoch(0, jax.random.key(0))
    assert int(tr.state.step) == 2
    path = str(tmp_path / "state.msgpack")
    tr.best = (0.5, 0.4, 0.3, 0.2)
    tr.save_full_state(path)

    tr2 = _make_trainer(str(tmp_path))
    assert int(tr2.state.step) == 0
    tr2.load_full_state(path)
    assert int(tr2.state.step) == 2
    assert tr2.best == (0.5, 0.4, 0.3, 0.2)
    a = jax.tree_util.tree_leaves(tr.state.params)[0]
    b = jax.tree_util.tree_leaves(tr2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer momenta restored too
    ma = jax.tree_util.tree_leaves(tr.state.opt_state)
    mb = jax.tree_util.tree_leaves(tr2.state.opt_state)
    same = [
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(ma, mb)
        if hasattr(x, "shape") and getattr(x, "shape", None) == getattr(y, "shape", None)
    ]
    assert all(same)
    # training continues from the restored state
    tr2.train_epoch(1, jax.random.key(1))
    assert int(tr2.state.step) == 4
