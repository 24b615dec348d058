"""Structured metric logging + profiling hooks.

The reference's observability is bare prints and a dead wandb config key
(SURVEY.md §5: wandb in requirements/config but never imported).  Here:

  - :class:`MetricLogger` — JSONL metric stream (step, wallclock, values)
    plus mirrored human-readable prints;
  - :func:`profile_trace` — context manager around ``jax.profiler`` for
    on-demand device traces (TensorBoard-compatible), the tracing
    subsystem the reference lacks.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Mapping


class MetricLogger:
    def __init__(self, workdir: str | None = None, name: str = "train"):
        self.path = None
        if workdir:
            os.makedirs(workdir, exist_ok=True)
            self.path = os.path.join(workdir, f"{name}_metrics.jsonl")
        self._t0 = time.time()

    def log(self, step: int, values: Mapping[str, Any], prefix: str = "") -> None:
        rec = {
            "step": int(step),
            "time_s": round(time.time() - self._t0, 3),
        }
        for k, v in values.items():
            key = f"{prefix}{k}"
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                rec[key] = str(v)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        shown = {k: v for k, v in rec.items() if k not in ("time_s",)}
        print(shown, flush=True)


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """Capture a device trace when ``logdir`` is set; no-op otherwise."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def count_params(params) -> int:
    """Total parameter count of a pytree (the reference profiles params
    via thop in its __main__ smoke blocks, simpleVQA_model.py:444-459)."""
    import jax

    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def flops_estimate(fn, *args) -> float | None:
    """Compiled-graph FLOPs estimate from XLA's cost analysis (the
    reference's thop.profile counterpart; thop counts module macs, XLA
    counts lowered-HLO flops — same order, different accounting).
    Returns None when the backend reports no estimate."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    try:
        cost = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    flops = (cost or {}).get("flops")
    return float(flops) if flops else None
