#!/bin/sh
# SimpleVQA inference -> output.txt (reference scripts/test.sh).
mkdir -p log
nohup python -u -m kvq_tpu.cli.test -o config/kwai_simpleVQA_test.yml \
  > log/kwai_simpleVQA_test.log 2>&1 &
