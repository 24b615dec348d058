#!/bin/sh
# SimpleVQA training (reference scripts/train.sh; gpu_id pinning is
# replaced by the JAX TPU runtime — all local chips are used via the mesh).
mkdir -p log
nohup python -u -m kvq_tpu.cli.train -o config/kwai_simpleVQA.yml \
  > log/kwai_simpleVQA.log 2>&1 &
