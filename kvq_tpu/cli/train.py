"""Training CLI — counterpart of reference train.py / train_ddp.py.

Usage (same flags as the reference, train.py:23-41):

    python -m kvq_tpu.cli.train -o config/Kwai_KSVQE.yml \
        -t val -r ./work [--epochs N]

One binary covers single-chip and multi-chip: with more than one device a
data mesh is built automatically (the DDP path is `shard_map`-based; there
is no separate train_ddp entry — `--ddp` is accepted for compatibility).
Multi-host: launch one process per host; `jax.distributed.initialize` is
called when JAX_COORDINATOR_ADDRESS is set.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..core.config import load_config
from ..train.trainer import Trainer


def parse_args(argv=None):
    p = argparse.ArgumentParser("kvq_tpu train")
    p.add_argument("-o", "--opt", required=True, help="YAML config path")
    p.add_argument("-t", "--test_set", default="val")
    p.add_argument("-r", "--resume", default="./work", help="checkpoint dir")
    p.add_argument("--gpu_id", default="0", help="ignored (torch compat)")
    p.add_argument("--local_rank", type=int, default=0, help="ignored")
    p.add_argument("--epochs", type=int, default=None, help="override")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--resume_from",
        default=None,
        help="full train-state checkpoint to resume (params/opt/EMA/step)",
    )
    p.add_argument(
        "--ddp",
        action="store_true",
        help="accepted for train_ddp.py compatibility; multi-host runs are "
        "configured via jax.distributed + the mesh, not a separate flag",
    )
    p.add_argument(
        "--debug_nans",
        action="store_true",
        help="raise on the first NaN/Inf produced under jit — the JAX "
        "counterpart of the reference's always-on "
        "torch.autograd.set_detect_anomaly (train_ddp.py:2); opt-in here "
        "because it disables some fusions",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    config = load_config(args.opt)
    os.makedirs(args.resume, exist_ok=True)

    trainer = Trainer(config, workdir=args.resume, test_set=args.test_set)
    trainer.build_datasets()
    sample = next(trainer.train_loader.epoch(0))
    trainer.build_models(sample, seed=args.seed)
    if args.resume_from:
        trainer.load_full_state(args.resume_from)
        print(f"resumed from {args.resume_from} at step {int(trainer.state.step)}")

    n_epochs = args.epochs or int(config["num_epochs"])
    rng = jax.random.key(args.seed)
    for epoch in range(n_epochs):
        rng, erng = jax.random.split(rng)
        best, best_ema = trainer.train_eval_all_epoches(epoch, erng)
        trainer.save_full_state(
            os.path.join(args.resume, f"{config['name']}_last_state.msgpack")
        )
        print(
            f"epoch {epoch}: best SRCC/PLCC/KRCC/RMSE = "
            f"{best[0]:.4f}/{best[1]:.4f}/{best[2]:.4f}/{best[3]:.4f} | "
            f"ema {best_ema[0]:.4f}/{best_ema[1]:.4f}/"
            f"{best_ema[2]:.4f}/{best_ema[3]:.4f}"
        )
    return trainer.best, trainer.best_ema


if __name__ == "__main__":
    main()
