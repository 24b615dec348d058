"""Host-side batching and device feeding.

Replaces the reference's torch DataLoader worker processes
(trainer.py:121-126) with a thread-pool prefetcher: dataset items are
produced by worker threads (decode + views are numpy/cv2 and release the
GIL), collated to batched numpy, and double-buffered onto the device so
host pipeline overlaps device compute.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Any, Iterator, Sequence

import numpy as np


_ARRAY_KEYS = (
    "fragment",
    "resize_video",
    "ori_fragment",
    "simpleVQA",
    "technical",
    "aesthetic",
    "feat",
)


def collate(items: Sequence[dict]) -> dict[str, Any]:
    """Stack array fields, gather scalars into arrays, pass through meta."""
    out: dict[str, Any] = {}
    first = items[0]
    for k in first:
        v = first[k]
        if k in _ARRAY_KEYS or (isinstance(v, np.ndarray) and v.ndim >= 2):
            out[k] = np.stack([it[k] for it in items])
        elif isinstance(v, (int, np.integer)):
            out[k] = np.asarray([it[k] for it in items], dtype=np.int32)
        elif isinstance(v, (float, np.floating)):
            out[k] = np.asarray([it[k] for it in items], dtype=np.float32)
        else:
            out[k] = [it[k] for it in items]
    return out


class Loader:
    """Threaded shuffling batch loader over an indexable dataset.

    ``shard``: (shard_index, num_shards) slices the sample list per host —
    the counterpart of torch's DistributedSampler (trainer_ddp.py:144,156).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 6,
        seed: int = 42,
        drop_last: bool = False,
        shard: tuple[int, int] = (0, 1),
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.shard = shard

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng((self.seed, epoch)).permutation(n)
        k, world = self.shard
        if world > 1 and n > 0:
            # Equal-length shards by cyclic tiling (torch DistributedSampler
            # parity, trainer_ddp.py:144-156): every host must run the
            # SAME number of batches per epoch or per-batch SPMD
            # collectives deadlock; duplicated samples are deduped at the
            # eval consumer via sample_index.  np.resize tiles, so this
            # holds even when the dataset is smaller than the world size.
            total = -(-n // world) * world
            idx = np.resize(idx, total)
        return idx[k::world]

    def __len__(self) -> int:
        n = len(self._epoch_indices(0))
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        indices = self._epoch_indices(epoch)
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if not batches:
            return

        work: "queue.Queue[tuple[int, np.ndarray] | None]" = queue.Queue()
        done: dict[int, dict] = {}
        done_lock = threading.Condition()

        for i, b in enumerate(batches):
            work.put((i, b))
        for _ in range(self.num_workers):
            work.put(None)

        def worker():
            while True:
                task = work.get()
                if task is None:
                    return
                i, idxs = task
                try:
                    items = [
                        self.dataset.__getitem__(int(j), epoch=epoch) for j in idxs
                    ]
                    batch = collate(items)
                    # authoritative global dataset positions — lets mesh /
                    # multi-host eval tag and dedupe rows for ANY dataset
                    # (overwrites the identical dataset-emitted values)
                    batch["sample_index"] = np.asarray(idxs, np.int32)
                except Exception as e:  # surface errors to the consumer
                    batch = {"__error__": e}
                with done_lock:
                    done[i] = batch
                    done_lock.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        try:
            for i in range(len(batches)):
                with done_lock:
                    while i not in done:
                        done_lock.wait()
                    batch = done.pop(i)
                if "__error__" in batch:
                    raise batch["__error__"]
                yield batch
        finally:
            # drain remaining work so threads exit
            try:
                while True:
                    work.get_nowait()
            except queue.Empty:
                pass

    def __iter__(self):
        return self.epoch(0)


def device_prefetch(iterator, size: int = 2):
    """Move batches to device ahead of consumption (double buffering).

    jax.device_put is async; keeping ``size`` batches in flight overlaps
    host decode + H2D copies with device compute.
    """
    import jax

    buf = collections.deque()

    def put(b):
        return {
            k: jax.device_put(v) if isinstance(v, np.ndarray) else v
            for k, v in b.items()
        }

    for b in iterator:
        buf.append(put(b))
        if len(buf) == size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def shard_prefetch(mesh, iterator, size: int = 2):
    """Mesh analog of :func:`device_prefetch`: keep ``size`` sharded global
    batches in flight ahead of consumption.

    ``shard_batch`` performs host-side numpy assembly plus the (async) H2D
    placement to every local device of the mesh; buffering ``size`` batches
    keeps that work overlapped with the in-flight train step, the same
    depth-2 pipelining the eval path uses (Trainer._eval_batches).  Order
    is preserved — results are step-for-step identical to the sequential
    form (tests/test_parallel.py)."""
    from ..parallel.sharding import shard_batch

    buf = collections.deque()
    for b in iterator:
        buf.append(shard_batch(mesh, b))
        if len(buf) == size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
