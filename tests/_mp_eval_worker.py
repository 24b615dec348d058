"""Worker for tests/test_multiprocess.py: one process of a 2-process
jax.distributed CPU job running the REAL multi-host eval path (wrapped
loader shards -> make_array_from_process_local_data global batches ->
tagged mesh eval step -> index dedupe).

Usage: python tests/_mp_eval_worker.py <rank> <world> <port> <n_val>
Prints one line ``METRICS <json>`` (every rank — replicated outputs make
them identical, which the parent asserts).
"""

import json
import os
import sys


def main():
    rank, world, port, n_val = (int(a) for a in sys.argv[1:5])

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        import jax._src.xla_bridge as _xb

        _xb._clear_backends()
    except Exception:
        pass
    jax.config.update("jax_num_cpu_devices", 8 // world)
    if world > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=world,
            process_id=rank,
        )
    assert jax.process_count() == world, jax.process_count()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from kvq_tpu.data.datasets import make_synthetic_opt
    from kvq_tpu.parallel.mesh import make_mesh
    from kvq_tpu.train.trainer import Trainer

    SAMPLE_TYPES = {
        "simpleVQA": dict(
            resize=48, crop=32, clip_len=4, frame_interval=2, t_frag=4,
            num_clips=1,
        )
    }
    val_opt = make_synthetic_opt(
        n_videos=n_val, n_frames=60, height=72, width=96,
        sample_types=SAMPLE_TYPES, phase="test", with_features=True,
    )
    cfg = {
        "name": "mp_eval",
        "num_epochs": 1,
        "warmup_epochs": 0,
        "ema": False,
        "save_model": False,
        "batch_size": 2,
        "eval_batch_size": 8,
        "num_workers": 2,
        "seed": 0,
        "ddp": True,
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

    mesh = make_mesh(data=4, fsdp=2)
    tr = Trainer(cfg, workdir=f"/tmp/mp_eval_work_{rank}", mesh=mesh)
    tr.build_datasets()
    sample = next(tr.val_loader.epoch(0))
    tr.build_models(sample, seed=0)
    rows = []
    for _b, _n, (p, gidx, glab) in tr._eval_batches(tr.state.params):
        rows.extend(zip(gidx or [], p, glab or []))
    print("ROWS", json.dumps([[int(i), float(s), float(l)] for i, s, l in rows]),
          flush=True)
    metrics = tr.evaluate()
    print("METRICS", json.dumps([float(m) for m in metrics]), flush=True)

    out = tr.inference_test(f"/tmp/mp_eval_work_{rank}/output.txt")
    print("NROWS", len(out), flush=True)

    if world == 1:
        return  # the train section below is sized for world=2 (2 rows per
        # device); at world=1 it would run 1-row shards (undefined plcc)
        # and the parent only asserts the world=2 TRAINAUX anyway

    # --- train path: one epoch of the shard_map DDP step across processes
    # (global batch assembled per process; grads psum'd over the wire).
    # 16 videos / local batch 8 -> one step, 2 rows per device (the
    # correlation losses need >=2 rows per shard).
    train_opt = make_synthetic_opt(
        n_videos=16, n_frames=60, height=72, width=96,
        sample_types=SAMPLE_TYPES, phase="train", with_features=True,
    )
    cfg_t = dict(cfg)
    cfg_t["data"] = {
        "train": {"type": "SimpleVQADataset", "args": train_opt},
        "val": {"type": "SimpleVQADataset", "args": val_opt},
    }
    cfg_t["batch_size"] = 8
    mesh_t = make_mesh(data=8, fsdp=1)
    trt = Trainer(cfg_t, workdir=f"/tmp/mp_train_work_{rank}", mesh=mesh_t)
    trt.build_datasets()
    sample = next(trt.val_loader.epoch(0))
    trt.build_models(sample, seed=0)
    aux = trt.train_epoch(0, jax.random.key(0))
    print("TRAINAUX", json.dumps({k: float(v) for k, v in aux.items()}),
          flush=True)


if __name__ == "__main__":
    main()
