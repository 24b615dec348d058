"""Challenge scoring CLI — runnable counterpart of reference
metric_score.py (which references undefined variables, SURVEY.md §5.1.4).

    python -m kvq_tpu.cli.metric_score \
        --pred prediction.csv --truth truth.csv [--rank_pairs rank-pair-val.xlsx]
"""

from __future__ import annotations

import argparse
import json

from ..core.metrics import score_prediction_file


def main(argv=None):
    p = argparse.ArgumentParser("kvq_tpu metric_score")
    p.add_argument("--pred", required=True)
    p.add_argument("--truth", required=True)
    p.add_argument("--rank_pairs", default=None)
    args = p.parse_args(argv)
    result = score_prediction_file(args.pred, args.truth, args.rank_pairs)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
