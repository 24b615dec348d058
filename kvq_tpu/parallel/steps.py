"""Sharded train/eval steps.

Two flavors:

  - :func:`make_ddp_train_step` — exact reference-DDP semantics via
    ``shard_map``: replicated params, per-shard batch + per-shard loss,
    gradient ``psum``-mean over 'data' (the bucketed all-reduce analog,
    trainer_ddp.py:93), cross-replica BatchNorm stats via the module's
    ``axis_name`` (SyncBatchNorm parity, trainer_ddp.py:92).
  - :func:`make_sharded_train_step` — ``jit`` + NamedSharding: batch
    sharded over ('data','fsdp'), params/optimizer state optionally sharded
    over 'fsdp' (zero-style).  The loss is computed *globally* (a strict
    upgrade over per-replica PLCC; enable ``ddp_loss_parity`` when
    bit-matching the reference matters).

Eval predictions come back as a global array — the `dist.all_gather` of
trainer_ddp.py:259-267 is subsumed by XLA's output layout.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train import optim
from ..train.losses import total_loss
from ..train.trainer import TrainState
from . import sharding as shd


def _loss_and_aux(model, config, params, batch_stats, batch, rng, train=True):
    is_ksvqe = config["model"]["type"] == "KSVQE"
    contra_w = float(config.get("contra_loss_weight", 0.3))
    rank_w = float(config.get("rank_loss_weight", 0.0))
    variables = {"params": params}
    mutable = []
    if batch_stats:
        variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"]
    rngs = {"dropout": rng}
    if is_ksvqe:
        rngs["qrs"] = jax.random.fold_in(rng, 1)
    out = model.apply(variables, batch, train=train, mutable=mutable, rngs=rngs)
    if mutable:
        out, mutated = out
        new_stats = mutated["batch_stats"]
    else:
        new_stats = batch_stats
    if is_ksvqe:
        scores, dis_contra = out
    else:
        scores, dis_contra = out, None
    loss, aux = total_loss(scores, batch["label"], dis_contra, contra_w, rank_w)
    return loss, (aux, new_stats)


def _apply_updates(tx, state: TrainState, grads, ema_decay, use_ema):
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_ema = (
        optim.ema_update(state.ema_params, new_params, ema_decay)
        if use_ema
        else state.ema_params
    )
    return TrainState(
        params=new_params,
        batch_stats=state.batch_stats,
        opt_state=new_opt_state,
        ema_params=new_ema,
        step=state.step + 1,
    )


def make_ddp_train_step(
    model, tx, config: dict, mesh: Mesh, ema_decay: float = 0.999
) -> Callable:
    """shard_map DP step — reference-DDP parity.

    Per-shard batch must be >= 2: the correlation losses are degenerate on
    a single sample (same constraint as the reference's per-GPU batch)."""
    from jax import shard_map

    use_ema = bool(config.get("ema", True))

    def step(state: TrainState, batch: dict, rng):
        # per-replica rng (different dropout/QRS noise per shard, like
        # per-process torch RNG under DDP)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def loss_fn(params):
            return _loss_and_aux(
                model, config, params, state.batch_stats, batch, rng
            )

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = jax.lax.pmean(grads, "data")
        aux = jax.lax.pmean(aux, "data")
        if new_stats:
            new_stats = jax.lax.pmean(new_stats, "data")
        state = state.replace(batch_stats=new_stats)
        new_state = _apply_updates(tx, state, grads, ema_decay, use_ema)
        return new_state, aux

    smapped = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped)


def make_sharded_train_step(
    model,
    tx,
    config: dict,
    mesh: Mesh,
    state_example: TrainState,
    ema_decay: float = 0.999,
) -> tuple[Callable, TrainState]:
    """jit + NamedSharding step with optional fsdp param sharding.

    Returns (step_fn, resharded_state)."""
    use_ema = bool(config.get("ema", True))

    p_sh = shd.param_shardings(mesh, state_example.params)
    rep = NamedSharding(mesh, P())

    state_shardings = TrainState(
        params=p_sh,
        batch_stats=jax.tree_util.tree_map(lambda _: rep, state_example.batch_stats),
        opt_state=jax.tree_util.tree_map(
            lambda x: rep, state_example.opt_state
        ),
        ema_params=jax.tree_util.tree_map(lambda _: rep, state_example.ema_params)
        if state_example.ema_params
        else (),
        step=rep,
    )
    # opt_state leaves that mirror a param shard the same way
    state_shardings = _match_opt_state_shardings(
        state_shardings, state_example, p_sh, rep
    )

    state = jax.device_put(state_example, state_shardings)

    def step(state: TrainState, batch: dict, rng):
        def loss_fn(params):
            return _loss_and_aux(
                model, config, params, state.batch_stats, batch, rng
            )

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.replace(batch_stats=new_stats)
        new_state = _apply_updates(tx, state, grads, ema_decay, use_ema)
        return new_state, aux

    batch_sh = NamedSharding(mesh, shd.batch_spec())
    jitted = jax.jit(
        step,
        in_shardings=(state_shardings, batch_sh, rep),
        out_shardings=(state_shardings, rep),
    )
    return jitted, state


def _match_opt_state_shardings(state_shardings, state_example, p_sh, rep):
    """Give optimizer-state leaves that are pytrees-of-param-shaped arrays
    (adam m/v, ema) the same shardings as the params."""
    flat_params, ptree = jax.tree_util.tree_flatten(state_example.params)
    flat_psh = jax.tree_util.tree_leaves(p_sh)
    shape_to_sh = {}
    for x, s in zip(flat_params, flat_psh):
        shape_to_sh.setdefault(tuple(x.shape), s)

    def pick(x):
        return shape_to_sh.get(tuple(getattr(x, "shape", ())), rep)

    opt_sh = jax.tree_util.tree_map(pick, state_example.opt_state)
    ema_sh = (
        jax.tree_util.tree_map(pick, state_example.ema_params)
        if state_example.ema_params
        else ()
    )
    return state_shardings.replace(opt_state=opt_sh, ema_params=ema_sh)


def make_eval_step(model, config: dict, mesh: Mesh | None = None) -> Callable:
    is_ksvqe = config["model"]["type"] == "KSVQE"

    def step(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, batch, train=False, reduce_scores=True)
        if is_ksvqe:
            out, _ = out
        return out

    if mesh is None:
        return jax.jit(step)

    def step_tagged(params, batch_stats, batch):
        # Pass the dataset index and label through with the scores: the
        # replicated output is the all_gather analog
        # (trainer_ddp.py:259-267), and tagging each row lets every host
        # consume GLOBAL results without assuming any device ordering
        # (multi-host batches are assembled per process, see
        # sharding.shard_batch) and lets the consumer dedupe rows
        # duplicated by shard wrapping / batch padding.
        scores = step(params, batch_stats, batch)
        return scores, batch["sample_index"], batch["label"]

    rep = NamedSharding(mesh, P())
    return jax.jit(
        step_tagged,
        in_shardings=(rep, rep, NamedSharding(mesh, shd.batch_spec())),
        out_shardings=rep,  # gathered predictions — the all_gather analog
    )
