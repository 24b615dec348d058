#!/bin/sh
# KSVQE training (reference scripts/train_KSVQE.sh).
mkdir -p log checkpoint
nohup python -u -m kvq_tpu.cli.train -o config/Kwai_KSVQE.yml -r checkpoint/ \
  > log/Kwai_KSVQE.log 2>&1 &
