"""Device mesh construction.

The reference's only parallelism is data parallel over NCCL
(SURVEY.md §2.4).  TPU-native equivalent: a `jax.sharding.Mesh` whose axes
ride ICI within a slice / DCN across slices, with XLA-scheduled
collectives.  Axes used by this package:

  - 'data': batch sharding (DP).  Gradient psum / all-gather of eval
    predictions replace DDP all-reduce / dist.all_gather.
  - 'fsdp': optional parameter + optimizer-state sharding (zero-style) —
    a capability beyond the reference, free under `jit` + NamedSharding.

Multi-host: call `jax.distributed.initialize()` before `make_mesh`; the
mesh spans all processes' devices.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    data: int | None = None, fsdp: int = 1, devices=None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // fsdp
    if data * fsdp != n:
        raise ValueError(f"mesh {data}x{fsdp} != {n} devices")
    arr = np.asarray(devices).reshape(data, fsdp)
    return Mesh(arr, ("data", "fsdp"))


def initialize_distributed(**kwargs) -> None:
    """Multi-host rendezvous — the `dist.init_process_group("nccl")` analog
    (reference train_ddp.py:55); on TPU pods the coordinator/process ids
    come from the environment automatically."""
    jax.distributed.initialize(**kwargs)
