#!/usr/bin/env python
"""Full-model parity check vs the PyTorch reference (VERDICT r1 item 1).

Runs the reference's own torch code (seeded random weights) and the
kvq_tpu rebuild on identical inputs + converted weights; prints one JSON
line per model with max |Δscore|.

    python tools/parity_check.py [--model ksvqe|simplevqa|all] [-T 8] [-B 1]

Runs on whatever JAX platform is active (TPU if available); torch side is
CPU.  The same logic runs CPU-only in tests/test_full_parity.py.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="all",
                    choices=["ksvqe", "simplevqa", "all"])
    ap.add_argument("-T", type=int, default=8)
    ap.add_argument("-B", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from kvq_tpu.compat import parity

    if args.model in ("simplevqa", "all"):
        r = parity.simplevqa_parity(B=max(args.B, 2), T=args.T, seed=args.seed)
        print(json.dumps({"model": "simpleVQA", **r}))
    if args.model in ("ksvqe", "all"):
        r = parity.ksvqe_parity(B=args.B, T=args.T, seed=args.seed)
        print(json.dumps({"model": "KSVQE", **r}))


if __name__ == "__main__":
    main()
