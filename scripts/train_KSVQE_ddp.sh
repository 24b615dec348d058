#!/bin/sh
# Multi-host data-parallel KSVQE training (reference scripts/train_KSVQE_ddp.sh).
# No torch.distributed.launch analog is needed: run this same command on
# every host of the TPU slice; jax.distributed.initialize() discovers the
# topology and the mesh spans all chips (kvq_tpu/parallel/mesh.py).
mkdir -p log checkpoint_ddp
nohup python -u -m kvq_tpu.cli.train -o config/Kwai_KSVQE.yml --ddp \
  -r checkpoint_ddp/ > log/Kwai_KSVQE_ddp.log 2>&1 &
