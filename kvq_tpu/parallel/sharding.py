"""Sharding specs for batches, parameters, and optimizer state."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_spec() -> P:
    """Batch leaves sharded on the leading axis over ('data', 'fsdp') —
    with fsdp=1 this is plain DP."""
    return P(("data", "fsdp"))


def batch_shardings(mesh: Mesh, batch) -> dict:
    s = NamedSharding(mesh, batch_spec())
    return jax.tree_util.tree_map(lambda _: s, batch)


def param_spec(path_str: str, x, fsdp_size: int, min_size: int = 2**16) -> P:
    """FSDP-style spec: shard the largest divisible axis of big params over
    'fsdp'; small params replicate.  With fsdp=1 everything replicates."""
    if fsdp_size <= 1 or x.size < min_size:
        return P()
    shape = np.shape(x)
    # prefer the last axis (contraction-friendly for Dense kernels)
    for axis in reversed(range(len(shape))):
        if shape[axis] % fsdp_size == 0 and shape[axis] >= fsdp_size:
            spec = [None] * len(shape)
            spec[axis] = "fsdp"
            return P(*spec)
    return P()


def param_shardings(mesh: Mesh, params, min_size: int = 2**16):
    fsdp_size = mesh.shape["fsdp"]

    def one(path, x):
        ps = "/".join(str(getattr(p, "key", p)) for p in path)
        return NamedSharding(mesh, param_spec(ps, x, fsdp_size, min_size))

    return jax.tree_util.tree_map_with_path(one, params)


def replicated(mesh: Mesh, tree):
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: s, tree)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host-global numpy batch onto the mesh, batch-sharded."""
    s = NamedSharding(mesh, batch_spec())
    return {
        k: jax.device_put(v, s) if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1
        else v
        for k, v in batch.items()
    }
