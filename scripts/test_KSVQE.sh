#!/bin/sh
# KSVQE inference -> output.txt + prediction.csv (reference scripts/test_KSVQE.sh).
python -m kvq_tpu.cli.test -o config/Kwai_KSVQE_test.yml --csv prediction.csv
