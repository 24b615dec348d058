"""Trainer — the counterpart of reference ``trainer.py`` /
``trainer_ddp.py`` Trainer, redesigned for JAX:

  - one jitted train step: forward (all model keys) -> composite loss ->
    AdamW update -> EMA, with BatchNorm stats mutated inside the step;
  - eval loop with the reference's clip-mean + rescale + scipy metrics and
    best-(SRCC+PLCC) checkpointing for both raw and EMA params
    ('n'/'s' suffixes, trainer.py:175-176,223-230);
  - works single-device or over a device mesh (see
    kvq_tpu/parallel/mesh.py): with a mesh, the batch is sharded over the
    'data' axis and XLA inserts the gradient psums — the DDP analog.

The eval reshape quirk is preserved: keys of ``config['model']['type']``
are reshaped per num_clips only when present in the batch; for KSVQE the
key is absent so 96 eval frames run as one clip (SURVEY.md §5.1.3).
"""

from __future__ import annotations

import functools
import os
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

import flax.serialization as _fser

from ..core import checkpoint as ckpt
from ..core.config import key_list, model_keys
from ..core.metrics import vqa_metrics
from ..core.registry import DATASETS
from ..data.pipeline import Loader, collate, device_prefetch
from ..models.vqa_network import VQANetwork
from . import optim
from .losses import total_loss

ARRAY_BATCH_KEYS = (
    "fragment",
    "resize_video",
    "simpleVQA",
    "technical",
    "aesthetic",
    "feat",
    "label",
    "dis_label",
    "sample_index",
)

# Image-view fields a bf16-compute model casts to its dtype as its FIRST
# op — shipping them to the device pre-cast is bitwise-identical and
# halves the H2D bytes (the fragment alone is ~95 MB/eval-batch at KVQ
# shapes).  ``feat`` stays f32: SimpleVQA concatenates it into an f32
# feature tensor, so a pre-cast would lose precision the model keeps.
VIEW_CAST_KEYS = (
    "fragment", "resize_video", "simpleVQA", "technical", "aesthetic",
)


def array_batch(batch: dict, to_device: bool = True,
                view_dtype=None) -> dict:
    """Strip a collated batch to the jit-traceable array fields.

    ``to_device=False`` keeps numpy arrays — mesh paths hand the batch to
    ``shard_batch`` which performs the (possibly multi-host) placement
    itself; a premature single-device jnp.asarray would just add a
    device round-trip.  ``view_dtype``: pre-cast the image views on the
    host (see VIEW_CAST_KEYS)."""
    conv = jnp.asarray if to_device else np.asarray

    def one(k):
        v = batch[k]
        if view_dtype is not None and k in VIEW_CAST_KEYS:
            return conv(np.asarray(v).astype(view_dtype))
        return conv(v)

    return {k: one(k) for k in ARRAY_BATCH_KEYS if k in batch}


def ser_to_state(opt_state):
    """optax state -> serializable nested dict."""
    return _fser.to_state_dict(opt_state)


def pad_batch_rows(batch: dict, target: int) -> dict:
    """Pad every leading-batch-dim field to ``target`` rows by repeating the
    last row.  Keeps the jitted eval signature static on the final partial
    batch; padded rows are dropped after scoring."""
    n = int(np.asarray(batch["label"]).reshape(-1).shape[0])
    if n >= target:
        return batch
    pad = target - n
    out: dict = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == n:
            out[k] = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
        elif isinstance(v, list) and len(v) == n:
            out[k] = v + [v[-1]] * pad
        else:
            out[k] = v
    return out


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray


class Trainer:
    def __init__(
        self,
        config: dict,
        workdir: str = "./work",
        test_set: str = "val",
        mesh=None,
    ):
        self.config = config
        self.workdir = workdir
        self.test_set = test_set
        self.key_list = key_list(config)
        self.is_ksvqe = config["model"]["type"] == "KSVQE"
        # multi-device DP: build a data mesh when requested (config['ddp'])
        # or when one is passed explicitly.  SyncBN (the DDP path's
        # BatchNorm pmean) needs the axis name at module construction.
        if mesh is None and bool(config.get("ddp")) and len(jax.devices()) > 1:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(data=len(jax.devices()))
        self.mesh = mesh
        self.model = VQANetwork(
            config=config,
            bn_axis_name="data" if mesh is not None else None,
        )
        self.ema_decay = float(config.get("ema_decay", 0.999))
        # pre-cast image views on the host when the model computes in
        # bf16 (bitwise-identical — the model casts them first thing —
        # and half the H2D bytes); "h2d_dtype": "float32" opts out.
        # Resolve the model dtype the way the model does (_dtype_of
        # defaults to bf16 when model.compute_dtype is omitted).
        from ..models.vqa_network import _dtype_of

        h2d = config.get("h2d_dtype")
        if h2d is None:
            cast = _dtype_of(config.get("model")) == jnp.bfloat16
        else:
            cast = h2d == "bfloat16"
        self._view_dtype = jnp.bfloat16 if cast else None
        self.use_ema = bool(config.get("ema", True))
        self.best = (-1.0, -1.0, -1.0, 1999.0)
        self.best_ema = (-1.0, -1.0, -1.0, 1999.0)
        self.state: TrainState | None = None
        self.train_loader: Loader | None = None
        self.val_loader: Loader | None = None
        self._tx = None
        self._mesh_train_step = None
        self._mesh_eval_step = None
        self._eval_row_pos = 0
        from ..core.logging import MetricLogger

        self.logger = MetricLogger(workdir, str(config.get("name", "train")))

    # ------------------------------------------------------------------ data
    def eval_batch_size(self) -> int:
        """Videos per eval step.  config['eval_batch_size'] wins; otherwise
        one video per mesh device (so the mesh eval step shards whole
        videos), or 1 single-device (reference val batch, trainer.py:123)."""
        eb = self.config.get("eval_batch_size")
        if eb:
            return int(eb)
        return self.mesh.devices.size if self.mesh is not None else 1

    def build_datasets(self) -> None:
        data_cfg = self.config["data"]
        nw = int(self.config.get("num_workers", 6))
        # per-host shard of the sample list — the DistributedSampler
        # analog (reference trainer_ddp.py:144,156); single-process this
        # is (0, 1) = the full list.
        shard = (jax.process_index(), jax.process_count())
        # model-side s2d_input needs the loader to ship packed fragments —
        # bridge the flag so configs only have to set it once (model.args)
        s2d = bool(
            self.config["model"]
            .get("args", {})
            .get(self.config["model"]["type"], {})
            .get("backbone", {})
            .get("s2d_input", False)
        )
        if s2d:
            for split in ("train", "val"):
                if split in data_cfg:
                    data_cfg[split]["args"]["fragment_s2d"] = True
        if "train" in data_cfg:
            ds = DATASETS.get(data_cfg["train"]["type"])(data_cfg["train"]["args"])
            self.train_loader = Loader(
                ds,
                batch_size=int(self.config["batch_size"]),
                shuffle=True,
                num_workers=nw,
                seed=int(self.config.get("seed", 42)),
                drop_last=True,
                shard=shard,
            )
        if "val" in data_cfg:
            ds = DATASETS.get(data_cfg["val"]["type"])(data_cfg["val"]["args"])
            self.val_loader = Loader(
                ds,
                batch_size=self.eval_batch_size(),
                shuffle=False,
                num_workers=nw,
                shard=shard,
            )

    # ----------------------------------------------------------------- model
    def build_models(self, sample_batch: dict, seed: int = 0) -> None:
        # Jitted init with the batch as an ARGUMENT: eager init dispatches
        # every op individually (measured ~600s through the remote-execution
        # tunnel, tools/bench_e2e.py r4), and a closed-over batch would be
        # embedded as an HLO constant re-uploaded with the program
        # (bench.py module docstring).  Jitted-as-argument: one compile.
        variables = jax.jit(
            lambda b: self.model.init(jax.random.key(seed), b, train=False)
        )(array_batch(sample_batch, view_dtype=self._view_dtype))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        load_path = self.config.get("load_path")
        if load_path:
            loaded = ckpt.load_checkpoint(load_path)
            src = loaded.get("params", loaded.get("state_dict", loaded))
            params, report = ckpt.merge_params(params, src, strict=False)
            print("loaded", load_path, {k: len(v) for k, v in report.items()})
            # converted torch checkpoints carry frozen-BN running stats
            # (CONTRIQUE/ResNet) — eval is wrong without them
            if batch_stats and loaded.get("batch_stats"):
                batch_stats, s_report = ckpt.merge_params(
                    batch_stats, loaded["batch_stats"], strict=False
                )
                print(
                    "loaded batch_stats",
                    {k: len(v) for k, v in s_report.items()},
                )

        n_train = len(self.train_loader) if self.train_loader else 1
        opt_cfg = self.config.get("optimizer", {})
        warmup_iters = int(float(self.config.get("warmup_epochs", 0)) * n_train)
        max_iters = int(
            (
                float(self.config.get("num_epochs", 1))
                + float(self.config.get("l_num_epochs", 0))
            )
            * n_train
        )
        frozen = optim.KSVQE_FROZEN_PATTERNS if self.is_ksvqe else ()
        self._tx = optim.build_optimizer(
            params,
            lr=float(opt_cfg.get("lr", 3e-5)),
            weight_decay=float(opt_cfg.get("wd", 0.05)),
            warmup_iters=warmup_iters,
            max_iters=max_iters,
            backbone_lr_mult=float(opt_cfg.get("backbone_lr_mult", 1.0)),
            frozen_patterns=frozen,
        )
        self.state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self._tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params)
            if self.use_ema
            else (),
            step=jnp.asarray(0, jnp.int32),
        )

    def save_full_state(self, path: str) -> None:
        """Full train-state checkpoint (params/opt/EMA/step) — resume
        capability the reference lacks (SURVEY.md §5 Checkpoint/resume)."""
        assert self.state is not None
        ckpt.save_checkpoint(
            path,
            {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": ser_to_state(self.state.opt_state),
                "ema_params": self.state.ema_params,
                "step": np.asarray(self.state.step),
                "best": np.asarray(self.best),
                "best_ema": np.asarray(self.best_ema),
            },
        )

    def load_full_state(self, path: str) -> None:
        assert self.state is not None, "call build_models first"
        loaded = ckpt.load_checkpoint(path)
        params, _ = ckpt.merge_params(self.state.params, loaded["params"])
        stats, _ = ckpt.merge_params(
            self.state.batch_stats, loaded.get("batch_stats", {})
        )
        ema = self.state.ema_params
        if self.use_ema and "ema_params" in loaded:
            ema, _ = ckpt.merge_params(self.state.ema_params, loaded["ema_params"])
        opt_state = self.state.opt_state
        if "opt_state" in loaded:
            try:
                opt_state = _fser.from_state_dict(
                    self.state.opt_state, loaded["opt_state"]
                )
            except (KeyError, ValueError) as e:
                raise ValueError(
                    f"checkpoint opt_state at {path!r} does not match the "
                    "current optimizer structure.  Checkpoints written "
                    "before the frozen-subtree optimizer mask (optax."
                    "masked adamw) have a different opt_state pytree and "
                    "cannot resume optimizer moments; re-save from a "
                    "current run, or load weights only by stripping "
                    "'opt_state' from the checkpoint."
                ) from e
        self.state = TrainState(
            params=params,
            batch_stats=stats,
            opt_state=opt_state,
            ema_params=ema,
            step=jnp.asarray(int(loaded.get("step", 0)), jnp.int32),
        )
        if "best" in loaded:
            self.best = tuple(float(x) for x in np.asarray(loaded["best"]))
        if "best_ema" in loaded:
            self.best_ema = tuple(float(x) for x in np.asarray(loaded["best_ema"]))

    # ------------------------------------------------------------------ steps
    @functools.partial(jax.jit, static_argnums=0)
    def _train_step(self, state: TrainState, batch: dict, rng):
        contra_w = float(self.config.get("contra_loss_weight", 0.3))
        rank_w = float(self.config.get("rank_loss_weight", 0.0))

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            # KSVQE additionally draws the perturbed-top-k noise from the
            # 'qrs' stream (nn/ksvqe.py:215) — fold it from the step rng
            # like the sharded step does (parallel/steps.py:47)
            rngs = {
                "dropout": jax.random.fold_in(rng, 0),
                "qrs": jax.random.fold_in(rng, 1),
            }
            out = self.model.apply(
                variables,
                batch,
                train=True,
                mutable=mutable,
                rngs=rngs,
            )
            if mutable:
                out, mutated = out
                new_stats = mutated["batch_stats"]
            else:
                new_stats = state.batch_stats
            if self.is_ksvqe:
                scores, dis_contra = out
            else:
                scores, dis_contra = out, None
            loss, aux = total_loss(
                scores, batch["label"], dis_contra, contra_w, rank_w
            )
            return loss, (aux, new_stats)

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = self._tx.update(
            grads, state.opt_state, state.params
        )
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_ema = (
            optim.ema_update(state.ema_params, new_params, self.ema_decay)
            if self.use_ema
            else state.ema_params
        )
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
            step=state.step + 1,
        )
        return new_state, aux

    @functools.partial(jax.jit, static_argnums=0)
    def _eval_step(self, params, batch_stats, batch: dict):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = self.model.apply(variables, batch, train=False, reduce_scores=True)
        if self.is_ksvqe:
            out, _ = out
        return out

    # ------------------------------------------------------------------ loops
    def _reshape_for_clips(self, batch: dict) -> dict:
        """Reference eval reshape (trainer.py:188-201): split the temporal
        axis into num_clips independent clips, folded into batch."""
        batch = dict(batch)
        nc_field = batch.get("num_clips")
        if isinstance(nc_field, list):
            nc_field = nc_field[0]
        for key in self.key_list:
            if key in batch:
                v = batch[key]
                b, t = v.shape[0], v.shape[1]
                nc = (
                    int(next(iter(nc_field.values())))
                    if isinstance(nc_field, dict)
                    else int(nc_field or 1)
                )
                if nc > 1:
                    batch[key] = v.reshape(b * nc, t // nc, *v.shape[2:])
        return batch

    def train_epoch(self, epoch: int, rng) -> dict:
        assert self.state is not None and self.train_loader is not None
        last_aux: dict = {}
        if self.mesh is not None:
            from ..data.pipeline import shard_prefetch
            from ..parallel import steps as psteps

            if self._mesh_train_step is None:
                self._mesh_train_step = psteps.make_ddp_train_step(
                    self.model, self._tx, self.config, self.mesh, self.ema_decay
                )
            # depth-2 in-flight sharded batches: batch N+1's host assembly
            # + H2D placement overlaps step N (the eval-path pipelining,
            # applied to the mesh train input)
            it = shard_prefetch(
                self.mesh,
                (array_batch(b, to_device=False,
                             view_dtype=self._view_dtype)
                 for b in self.train_loader.epoch(epoch)),
            )
            for sb in it:
                rng, step_rng = jax.random.split(rng)
                self.state, aux = self._mesh_train_step(
                    self.state, sb, step_rng
                )
                last_aux = aux
            return {k: float(v) for k, v in last_aux.items()}
        it = device_prefetch(self.train_loader.epoch(epoch))
        for batch in it:
            rng, step_rng = jax.random.split(rng)
            self.state, aux = self._train_step(
                self.state,
                array_batch(batch, view_dtype=self._view_dtype), step_rng
            )
            last_aux = aux
        return {k: float(v) for k, v in last_aux.items()}

    def _eval_dispatch(self, params, batch: dict) -> tuple[int, Any, list]:
        """Host-prep one eval batch and dispatch the jitted step.

        Returns ``(n_valid, device_out, labels)`` WITHOUT reading the
        result back — jax dispatch is async, so the caller can keep a
        second batch's pad/reshape + H2D copy in flight while the device
        is busy (see ``evaluate``).

        Batched upgrade over the reference's strictly-sequential batch-1
        validation (trainer.py:180-214): ``eval_batch_size`` videos fold
        their clips into one device batch; on a mesh the rows are sharded
        over devices and XLA's output layout performs the prediction
        gather (the dist.all_gather analog, trainer_ddp.py:259-267)."""
        n = int(np.asarray(batch["label"]).reshape(-1).shape[0])
        if "sample_index" not in batch:
            # The Loader stamps authoritative global dataset positions on
            # every batch; hand-built batches (tests, direct calls) get a
            # host-local running position instead.  That is only valid on
            # one process — multi-host mesh dedupe needs global indices.
            if self.mesh is not None and jax.process_count() > 1:
                raise ValueError(
                    "multi-host mesh eval requires batches with "
                    "'sample_index' (the Loader adds it automatically)"
                )
            batch = dict(batch)
            batch["sample_index"] = np.arange(
                self._eval_row_pos, self._eval_row_pos + n, dtype=np.int32
            )
            self._eval_row_pos += n
        eb = self.eval_batch_size()
        batch = pad_batch_rows(batch, eb)
        rb = self._reshape_for_clips(batch)
        ab = array_batch(rb, to_device=self.mesh is None,
                         view_dtype=self._view_dtype)
        if self.mesh is not None:
            from ..parallel import sharding as shd
            from ..parallel import steps as psteps

            if self._mesh_eval_step is None:
                self._mesh_eval_step = psteps.make_eval_step(
                    self.model, self.config, self.mesh
                )
            ab = shd.shard_batch(self.mesh, ab)
            out = self._mesh_eval_step(params, self.state.batch_stats, ab)
        else:
            out = self._eval_step(params, self.state.batch_stats, ab)
        labels = np.asarray(batch["label"], np.float64).reshape(-1)
        return n, out, labels[:n].tolist()

    def _eval_collect(self, n: int, out) -> tuple[list, list | None, list | None]:
        """Block on one dispatched eval batch.

        Local jit path: ``(first-n per-video predictions, None, None)``.
        Mesh path (tagged step, parallel/steps.py make_eval_step): the
        replicated output covers EVERY row of the (possibly multi-host)
        global batch -> ``(all predictions, dataset indices, labels)``;
        the consumer dedupes padding/wrap duplicates by index."""
        if isinstance(out, tuple):
            scores, gidx, glab = out
            gidx = np.asarray(gidx).reshape(-1)
            glab = np.asarray(glab, np.float64).reshape(-1)
            rows = gidx.shape[0]
            per_video = np.asarray(scores).reshape(rows, -1).mean(axis=1)
            return (
                per_video.tolist(),
                [int(i) for i in gidx],
                glab.tolist(),
            )
        eb = self.eval_batch_size()
        per_video = np.asarray(out).reshape(eb, -1).mean(axis=1)
        return per_video[:n].tolist(), None, None

    def _eval_scores(self, params, batch: dict) -> tuple[list, list]:
        """Score one (possibly padded) eval batch -> per-video preds+labels.

        On a multi-host mesh the tagged step returns GLOBAL rows — those
        are returned with their own passthrough labels (local trimming
        would mispair other hosts' predictions with local labels)."""
        n, out, labels = self._eval_dispatch(params, batch)
        preds, gidx, glab = self._eval_collect(n, out)
        if gidx is not None and jax.process_count() > 1:
            return preds, glab
        return preds[:n], labels

    def _eval_batches(self, params):
        """Yield ``(batch, n_valid, (preds, gidx, glab))`` in loader order
        — the last element is ``_eval_collect``'s triple (gidx/glab are
        None on the local-jit path) — keeping up to ``eval_pipeline_depth``
        (default 2) dispatched batches in flight so batch N+1's host prep
        + H2D copy overlaps batch N's device scoring.  Set
        ``eval_pipeline_depth: 1`` in the config to restore strictly-
        sequential eval (one batch resident on device) when
        eval_batch_size is tuned to the HBM limit."""
        depth = max(1, int(self.config.get("eval_pipeline_depth", 2)))
        self._eval_row_pos = 0  # synthetic-index counter, see _eval_dispatch
        pending: list[tuple[dict, int, Any]] = []
        for batch in self.val_loader.epoch(0):
            n, out, _ = self._eval_dispatch(params, batch)
            pending.append((batch, n, out))
            if len(pending) >= depth:
                b, n0, out0 = pending.pop(0)
                yield b, n0, self._eval_collect(n0, out0)
        for b, n0, out0 in pending:
            yield b, n0, self._eval_collect(n0, out0)

    @staticmethod
    def _global_gather(values: list[float]) -> list[float]:
        """Concatenate per-host prediction/label lists across processes
        (multi-host analog of reference trainer_ddp.py:259-267).  Hosts may
        hold shard counts differing by one, so pad-to-max then trim."""
        if jax.process_count() == 1:
            return values
        from jax.experimental import multihost_utils as mhu

        n = np.asarray(values).shape[0]
        counts = np.asarray(mhu.process_allgather(np.asarray([n])))
        counts = counts.reshape(-1)
        m = int(counts.max())
        padded = np.zeros((m,), np.float64)
        padded[:n] = np.asarray(values, np.float64)
        gathered = np.asarray(mhu.process_allgather(padded))
        gathered = gathered.reshape(jax.process_count(), m)
        return [
            float(x)
            for k in range(jax.process_count())
            for x in gathered[k, : counts[k]]
        ]

    @staticmethod
    def _merge_rows(seen: dict, order: list, gidx, *cols) -> None:
        """First-occurrence merge of tagged rows: dedupes the shard-wrap /
        batch-padding duplicates by dataset index (shared by evaluate and
        inference_test)."""
        for row in zip(gidx, *cols):
            if row[0] not in seen:
                seen[row[0]] = row[1:]
                order.append(row[0])

    def evaluate(self, use_ema: bool = False) -> tuple:
        """Validation pass, double-buffered: batch N+1's pad/reshape and
        H2D copy run while the device scores batch N (the readback in
        ``_eval_collect`` is the only sync point)."""
        assert self.state is not None and self.val_loader is not None
        params = self.state.ema_params if use_ema else self.state.params
        preds, labels = [], []
        seen: dict[int, tuple] = {}
        order: list[int] = []
        for batch, n, (p, gidx, glab) in self._eval_batches(params):
            if gidx is None:
                preds.extend(p[:n])
                lab = np.asarray(batch["label"], np.float64).reshape(-1)
                labels.extend(lab[:n].tolist())
            else:
                # mesh path: rows are global and tagged
                self._merge_rows(seen, order, gidx, p, glab)
        if order:
            preds = [seen[i][0] for i in order]
            labels = [seen[i][1] for i in order]
        else:
            # local-jit path: merge per-host shards
            preds = self._global_gather(preds)
            labels = self._global_gather(labels)
        return vqa_metrics(labels, preds)

    def train_eval_all_epoches(self, epoch: int, rng=None):
        rng = rng if rng is not None else jax.random.key(epoch)
        aux = self.train_epoch(epoch, rng)
        step = int(self.state.step) if self.state is not None else 0
        self.logger.log(step, aux, prefix="train/")
        self.best = self._eval_and_maybe_save(False, self.best, "n")
        if self.use_ema:
            self.best_ema = self._eval_and_maybe_save(True, self.best_ema, "s")
        self.logger.log(
            step,
            {
                "best_srcc": self.best[0],
                "best_plcc": self.best[1],
                "best_krcc": self.best[2],
                "best_rmse": self.best[3],
            },
            prefix=f"val_{'n'}/",
        )
        return self.best, self.best_ema

    def _eval_and_maybe_save(self, use_ema: bool, best: tuple, suffix: str):
        m = self.evaluate(use_ema=use_ema)
        best_s, best_p, best_k, best_r = best
        if m.srcc + m.plcc > best_s + best_p and self.config.get("save_model", True):
            name = f"{self.config['name']}_head_{self.test_set}"
            path = os.path.join(
                self.workdir, f"{name}_{suffix}_finetuned.msgpack"
            )
            state = self.state
            ckpt.save_checkpoint(
                path,
                {
                    "params": state.ema_params if use_ema else state.params,
                    "batch_stats": state.batch_stats,
                    "validation_results": np.asarray(best),
                },
            )
        return (
            max(best_s, m.srcc),
            max(best_p, m.plcc),
            max(best_k, m.krcc),
            min(best_r, m.rmse),
        )

    # ---------------------------------------------------------------- inference
    def inference_test(self, output_path: str = "output.txt") -> list:
        """Working equivalent of the reference's broken ``test.py`` entry
        (SURVEY.md §5.1.1): writes ``video_name,score`` lines."""
        assert self.state is not None and self.val_loader is not None
        multi = jax.process_count() > 1
        infos = getattr(self.val_loader.dataset, "video_infos", None)
        if multi and infos is None:
            raise ValueError(
                "multi-host inference_test needs the dataset to expose "
                "video_infos so global rows can be named"
            )

        def name_of(i: int, name_map: dict) -> str:
            return infos[i]["video_name"] if infos is not None else name_map[i]

        results: list[tuple] = []
        local_idx: list[int] = []
        name_map: dict[int, str] = {}
        seen: dict[int, tuple] = {}
        order: list[int] = []
        for batch, n, (p, gidx, _) in self._eval_batches(self.state.params):
            bi = np.asarray(batch["sample_index"]).reshape(-1)
            name_map.update(zip(
                (int(i) for i in bi), list(batch["video_name"])
            ))
            if gidx is None:
                results.extend(zip(list(batch["video_name"])[:n], p[:n]))
                local_idx.extend(int(i) for i in bi[:n])
            else:
                # mesh path: global tagged rows — dedupe wrap/pad duplicates
                self._merge_rows(seen, order, gidx, p)
        if order:
            results = [(name_of(i, name_map), seen[i][0]) for i in order]
        elif multi:
            # local-jit multi-host: every host scored only its loader
            # shard — merge by (dataset index, score) before writing
            gi = [int(x) for x in self._global_gather([float(i) for i in local_idx])]
            gs = self._global_gather([float(s) for _, s in results])
            merged: dict[int, float] = {}
            for i, s in zip(gi, gs):
                merged.setdefault(i, s)
            results = [(name_of(i, name_map), merged[i]) for i in sorted(merged)]
        if jax.process_index() == 0:
            with open(output_path, "w") as f:
                for name, score in results:
                    f.write(f"{name},{score}\n")
        return results
