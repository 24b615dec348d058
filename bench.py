"""Benchmark: KSVQE inference throughput on one TPU chip, paper shapes.

Measures the reference's eval workload (config/Kwai_KSVQE.yml val):
96-frame clips (num_clips=3 x clip_len=32 fed as ONE clip — the
reference's eval path, SURVEY.md §5.1.3), fragment 288x288 + resize
112x112, full KSVQE (CLIP ViT-B/16 + CONTRIQUE R50 + QRS + Swin-T-3D +
CDM) + VQAHead, bfloat16 compute, Pallas window attention.

Methodology (eval AND train, one methodology): run K steps *inside one
jitted program* with a data-dependency chain and a scalar readback, then
difference two K values — this cancels the fixed per-call round-trip
(~30 ms) and defeats any identical-call caching.  (block_until_ready
does NOT synchronize on this platform; only host readback does.)  Train
uses ``lax.scan`` over full optimizer steps so the in-jit loop holds only
one step's activations (an unrolled loop OOMs HBM).

The model is initialized ONCE and the variables are reused across the
batch-size sweep (params are B-independent).  Init generates synthetic
weights ON DEVICE (``jax.eval_shape`` for the tree, one threefry draw
sliced per leaf): the r3/r4 driver records' 300+ s ``init_s`` were XLA
costs hiding inside a jitted ``model.init`` — r3 a closure-captured
~45 MB batch re-uploaded as an HLO constant every run, r4 the full eval
forward cold-compiling on the driver's empty compile cache (dev
sessions' warm /tmp cache masked it) — and a host-side materialization
still paid 53-81 s shipping ~640 MB through the tunnel.  The generator
compiles cold + runs in ~10 s; the model's cold compile shows up in the
first ``compile_s``.

Output contract: the headline JSON line is printed IMMEDIATELY after the
train measurement, before the auxiliary e2e-serving phase; e2e then runs
under a hard SIGALRM budget and a second, enriched JSON line (same
schema, plus the e2e field) is printed if it completes or times out.
The last JSON line on stdout is always the most complete record, and a
headline line exists even if the process is killed mid-e2e.
"""

import json
import sys
import time

import numpy as np


def note(msg):
    """Progress line on stderr (stdout carries only the JSON lines) — the
    full run is many minutes of remote compiles; silent hangs are
    undiagnosable through the tunnel otherwise."""
    print(f"[bench +{time.monotonic() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.monotonic()

# Estimated reference (torch eager, A100, batch 1, eval path) KSVQE
# throughput.  Derivation: ~0.5 TFLOP/video (Video-Swin-T 96f ~264 GF +
# CONTRIQUE 2352x32x32 patches ~200 GF + CLIP 4 keyframes ~18 GF); torch
# eager eval-batch-1 on A100 sustains ~10-15% MFU on this mix of small
# kernels => ~2-4 videos/s.  Point estimate:
A100_REFERENCE_VIDEOS_PER_SEC = 3.0

# Analytic model FLOPs per 96-frame video (same derivation as above:
# Swin-T-3D ~264 GF + CONTRIQUE ~200 GF + CLIP keyframes ~18 GF + CDM/QRS
# small) — used for the MFU line.  v5e bf16 peak: 197 TFLOP/s.
TFLOP_PER_VIDEO = 0.5
# Analytic fwd+bwd FLOPs per 32-frame TRAIN video: fwd = Swin 264*(32/96)
# = 88 GF + CONTRIQUE 200*(16/48) = 67 GF + CLIP keyframes 18 GF + CDM/QRS/
# head ~5 GF = 178 GF; bwd = 2x the differentiated portion only — Swin+CDM
# (~93 GF) and CLIP blocks >= CLIP_location (~6 GF); CONTRIQUE is frozen
# AND input-detached (KSVQE_model.py:1425 parity) so it has no backward.
TRAIN_TFLOP_PER_VIDEO = 0.38
V5E_PEAK_TFLOPS = 197.0

# Hard wall budget for the auxiliary e2e-serving phase (SIGALRM).  The
# phase decodes real mp4s on this 1-vCPU host; r3 let it run unbounded
# and the driver killed the whole bench (BENCH_r03 rc=124) — the budget
# guarantees the enriched JSON line is printed either way.
E2E_BUDGET_S = 420


def compiled_tflops(lowered_compiled):
    """Total executed TFLOPs from XLA's cost model (None if unavailable).
    Counts executed flops — including Pallas CostEstimate declarations —
    so it cross-checks the analytic constants above."""
    try:
        ca = lowered_compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca["flops"]) / 1e12
    except Exception:
        return None


def make_model(checkpoint=False, s2d=True):
    """The flagship eval/train model (shipped config's KSVQE).

    s2d: ship the fragment space-to-depth packed (the shipped-config
    default, config/Kwai_KSVQE.yml) — bitwise-identical outputs
    (tests/test_s2d.py), no on-device C=3-minor patch-embed relayout."""
    from kvq_tpu.models.vqa_network import VQANetwork

    config = {
        "model": {
            "type": "KSVQE",
            "compute_dtype": "bfloat16",
            "args": {
                "KSVQE": {
                    "backbone": {
                        "num_samples": 1,
                        "sample_type": "topkpertubation",
                        "CLIP_location": 8,
                        "cls_use": True,
                        "tuning_stage": 1,
                        "a1": 1,
                        "a2": 2,
                        "checkpoint": checkpoint,
                        "use_pallas": True,
                        "s2d_input": s2d,
                    },
                    "head": {"in_channels": 768, "hidden_channels": 64},
                }
            },
        }
    }
    return VQANetwork(config=config)


def make_batch(B, T, jnp, s2d=True, seed=0):
    rng = np.random.default_rng(seed)
    frag = rng.normal(size=(B, T, 288, 288, 3)).astype(np.float32)
    if s2d:
        from kvq_tpu.data.fragments import s2d_pack

        frag = np.stack([s2d_pack(f) for f in frag])
    return {
        "fragment": jnp.asarray(frag, jnp.bfloat16),
        "resize_video": jnp.asarray(
            rng.normal(size=(B, T, 112, 112, 3)), jnp.bfloat16
        ),
        "dis_label": jnp.zeros((B,), jnp.int32),
    }


def init_variables(model, batch):
    """Cheap synthetic init: no model-forward compile, no bulk transfer
    (VERDICT r4 #4).

    ``jax.eval_shape`` traces init abstractly for the exact variable tree
    (shapes + dtypes); leaves are then generated on device by leaf name
    (scale/var -> 1, bias/mean -> 0, else N(0, 0.02)) from one threefry
    draw.  Bench weights only need sane numeric scale — every parity/
    accuracy test initializes for real.  Why: the r4 driver record's
    init_s=339.1 was the full eval forward cold-compiling inside the
    jitted ``model.init`` (the driver host starts with an empty /tmp
    compile cache; dev sessions' warm cache made the same init look
    <1 s).  The generator program compiles in seconds (no model
    forward in it), so the model's cold-compile cost now lands where it
    belongs — in the first measured compile_s."""
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    shapes = jax.eval_shape(
        lambda b: model.init(
            {"params": jax.random.key(0), "qrs": jax.random.key(1)},
            b,
            train=False,
        ),
        batch,
    )
    leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    total = sum(int(np.prod(l.shape)) for _, l in leaves)
    note(f"init: traced {len(leaves)} leaves in "
         f"{time.time() - t0:.0f}s, generating on device")

    # Materialize ON DEVICE: one threefry draw sliced per leaf.  A host
    # materialization + device_put of the same ~640 MB tree measured
    # 53-81 s through the remote-execution tunnel (~10-30 MB/s); this
    # program compiles cold + runs in ~10 s and transfers nothing.
    def gen():
        flat = jax.random.normal(
            jax.random.key(0), (total,), jnp.float32
        ) * 0.02
        outs = []
        off = 0
        for path, leaf in leaves:
            last = path[-1]
            name = str(getattr(last, "key", getattr(last, "name", last)))
            n = int(np.prod(leaf.shape))
            if name in ("scale", "var"):
                outs.append(jnp.ones(leaf.shape, leaf.dtype))
            elif name in ("bias", "mean"):
                outs.append(jnp.zeros(leaf.shape, leaf.dtype))
            else:
                outs.append(
                    jax.lax.dynamic_slice(flat, (off,), (n,))
                    .reshape(leaf.shape).astype(leaf.dtype)
                )
            off += n
        return jax.tree_util.tree_unflatten(treedef, outs)

    t1 = time.time()
    variables = jax.jit(gen)()
    _ = float(
        np.asarray(
            jax.tree_util.tree_leaves(variables["params"])[0]
        ).reshape(-1)[0]
    )  # force execution
    note(f"init: generator compile+run+force {time.time() - t1:.0f}s "
         f"(observed 5-900s across runs — tunnel-state dependent; the "
         f"program itself compiles cold in ~10s)")
    return variables, time.time() - t0


def measure(B, model, variables, T=96, reps=3):
    """Eval step time at batch B via in-jit two-loop differencing."""
    import functools

    import jax
    import jax.numpy as jnp

    batch = make_batch(B, T, jnp)

    @functools.partial(jax.jit, static_argnums=3)
    def eval_n(vs, b, eps, n):
        acc = jnp.float32(0)
        # eps*1e-2 is representable in bf16 at ~N(0,1) data scale, so the
        # fragment tensor itself differs bitwise across reps (eps*1e-6 was
        # below bf16 ULP — the distinct eps *argument* alone defeated
        # caching, but only by accident of the cache key)
        frag = b["fragment"] + (eps * jnp.float32(1e-2)).astype(
            b["fragment"].dtype
        )
        for _ in range(n):
            bb = dict(b, fragment=frag)
            scores, _ = model.apply(vs, bb, train=False, reduce_scores=True)
            s = jnp.sum(scores.astype(jnp.float32))
            acc = acc + s
            # data dependency: next iteration's input depends on this score
            frag = b["fragment"] + (s * jnp.float32(1e-6)).astype(frag.dtype)
        return acc

    n1, n2 = 1, 5
    t0 = time.time()
    float(eval_n(variables, batch, jnp.float32(0), n1))
    compile_s = time.time() - t0
    note(f"B={B}: short-variant compile {compile_s:.0f}s")
    float(eval_n(variables, batch, jnp.float32(0), n2))  # compile long
    note(f"B={B}: long-variant compiled, timing")

    def timed(n):
        times = []
        for r in range(reps):
            eps = jnp.float32(r + 1)  # distinct args per rep
            t0 = time.time()
            float(eval_n(variables, batch, eps, n))
            times.append(time.time() - t0)
        return times

    t_short = timed(n1)
    t_long = timed(n2)
    # Headline = best-of-reps differencing (noise floor); the per-rep
    # paired differences give the run-to-run band so the record carries
    # its own variance (VERDICT r4 item 3: the B=1 number swung ±11%
    # across driver days with no code change — publish the spread).
    per_rep = sorted(
        max((tl - ts) / (n2 - n1), 1e-9)
        for tl, ts in zip(t_long, t_short)
    )
    step_s = max((min(t_long) - min(t_short)) / (n2 - n1), 1e-9)
    stats = {
        "step_ms_median": round(per_rep[len(per_rep) // 2] * 1000, 1),
        "step_ms_band": [round(per_rep[0] * 1000, 1),
                         round(per_rep[-1] * 1000, 1)],
    }
    tf = compiled_tflops(
        eval_n.lower(variables, batch, jnp.float32(0), 1).compile()
    )
    tf_video = tf / B if tf else None
    return B / step_s, step_s, compile_s, tf_video, stats


def measure_train(B=4, T=32, reps=3, variables=None):
    """Full train step (KSVQE fwd+bwd, AdamW, EMA, remat off): K optimizer
    steps under ``lax.scan`` inside one jitted program, differenced across
    two K values — the SAME methodology as eval (r3 used single dispatched
    calls whose ~30 ms round-trip inflated a ~150 ms step by ~20%; scan
    keeps only one step's activations live so it does not OOM the way an
    unrolled in-jit loop does).

    ``variables``: reuse the eval phase's initialized weights — params are
    B/T-independent and a COLD train-mode init compile costs ~20 min on
    this host (measured 1227 s; the train=True XLA forward is a much
    bigger trace than eval's), which would eat the whole driver budget on
    a cold compilation cache."""
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from kvq_tpu.train.losses import plcc_loss
    from kvq_tpu.train.optim import (
        KSVQE_FROZEN_PATTERNS,
        build_optimizer,
        ema_update,
    )

    # remat off: B=4 x T=32 fits v5e HBM without it and runs ~19% faster
    # (docs/PERF.md) — matches the shipped config (Kwai_KSVQE.yml)
    model = make_model(checkpoint=False)
    config = model.config
    batch = make_batch(B, T, jnp, seed=2)
    batch = dict(
        batch,
        dis_label=jnp.asarray([i % 4 for i in range(B)], jnp.int32),
        label=jnp.asarray(
            np.random.default_rng(1).normal(size=(B,)), jnp.float32
        ),
    )
    if variables is None:
        # standalone use: train=False init creates the identical variable
        # tree (no module creates params only in train mode); host-side,
        # so no XLA compile at all
        variables, init_s = init_variables(model, batch)
        note(f"train init {init_s:.0f}s")
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = build_optimizer(
        params, lr=3e-5, weight_decay=0.05, warmup_iters=50, max_iters=1000,
        frozen_patterns=KSVQE_FROZEN_PATTERNS,
    )
    opt_state = tx.init(params)

    from kvq_tpu.models.vqa_network import VQANetwork

    def one_step(params, ema_params, opt_state, b, key):
        k1, k2 = jax.random.split(key)

        def loss_fn(p):
            out = VQANetwork(config=config).apply(
                {"params": p, **(
                    {"batch_stats": batch_stats} if batch_stats else {}
                )},
                b, train=True, reduce_scores=True,
                rngs={"qrs": k1, "dropout": k2},
            )
            scores, dis_loss = out
            return (plcc_loss(scores, b["label"]) + 0.3 * dis_loss).astype(
                jnp.float32
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = ema_update(ema_params, params, 0.999)
        return params, ema_params, opt_state, loss

    @functools.partial(jax.jit, static_argnums=4)
    def train_n(params, ema, opt_state, key, n, b):
        def body(carry, i):
            p, e, o = carry
            p, e, o, loss = one_step(p, e, o, b, jax.random.fold_in(key, i))
            return (p, e, o), loss

        (params, ema, opt_state), losses = jax.lax.scan(
            body, (params, ema, opt_state), jnp.arange(n)
        )
        return jnp.sum(losses)

    ema = jax.tree_util.tree_map(lambda t: t, params)
    n1, n2 = 1, 4
    t0 = time.time()
    float(train_n(params, ema, opt_state, jax.random.key(3), n1, batch))
    note(f"train short-variant compile {time.time() - t0:.0f}s")
    float(train_n(params, ema, opt_state, jax.random.key(3), n2, batch))
    note("train long-variant compiled, timing")

    def timed(n):
        best = float("inf")
        for r in range(reps):
            key = jax.random.key(10 + r)  # distinct args per rep
            t0 = time.time()
            float(train_n(params, ema, opt_state, key, n, batch))
            best = min(best, time.time() - t0)
        return best

    t_short = timed(n1)
    t_long = timed(n2)
    step_s = max((t_long - t_short) / (n2 - n1), 1e-9)
    tf = compiled_tflops(
        train_n.lower(
            params, ema, opt_state, jax.random.key(3), 1, batch
        ).compile()
    )
    return B / step_s, step_s, (tf / B if tf else None)


def probe_tpu(timeout_s=120, retries=2):
    """Bounded TPU-availability check.  When the axon tunnel is down,
    ``jax.devices()`` HANGS in C code rather than raising, so the probe
    must run in a subprocess with a hard timeout.  Returns an error
    string (None = healthy)."""
    import subprocess
    import sys

    err = None
    for k in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=timeout_s, text=True,
            )
            if r.returncode == 0:
                return None
            err = (r.stderr or "backend init failed").strip()[-200:]
        except subprocess.TimeoutExpired:
            err = f"jax.devices() hung >{timeout_s}s (tunnel down?)"
        if k + 1 < retries:
            time.sleep(15)
    return err


def run_e2e_timeboxed(budget_s=E2E_BUDGET_S):
    """Auxiliary end-to-end serving phase under a hard SIGALRM budget."""
    import signal

    def on_alarm(signum, frame):
        raise TimeoutError(f"e2e exceeded {budget_s}s budget")

    old = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(budget_s)
    try:
        sys.path.insert(0, ".")
        from tools.bench_e2e import run_e2e

        # eval_batch=1: B=1 is the serving optimum AND avoids the B=4
        # compile pathology (342.9 s to compile the B=4 eval program vs
        # 37 s at B=1/8/16, BENCH_r04 sweep) that ate the r4 e2e budget
        e2e = run_e2e(n_videos=4, workers=2, eval_batch=1, probe=False)
        if "detail" in e2e:
            note(f"e2e: {e2e['value']} videos/s "
                 f"({e2e['detail']['decode_backend']} decode)")
        return e2e
    except Exception as e:  # noqa: BLE001 — e2e is auxiliary to the metric
        note(f"e2e failed: {type(e).__name__}: {str(e)[:200]}")
        return {"error": f"{type(e).__name__}: {str(e)[:200]}",
                "budget_s": budget_s}
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main():
    import jax

    err = probe_tpu()
    if err is not None:
        print(json.dumps({
            "metric": "KSVQE eval videos/sec/chip (96-frame KVQ val workload)",
            "value": 0.0,
            "unit": "videos/s",
            "vs_baseline": 0.0,
            "detail": {
                "error": f"TPU backend unavailable: {err}",
                "note": "hardware outage at bench time, not a perf result; "
                        "see the previous BENCH_r*.json for the last "
                        "recorded measurement",
            },
        }), flush=True)
        return

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")
    import jax.numpy as jnp

    note("building model + B=1 batch")
    model = make_model()
    note("initializing variables once (shared across the sweep)")
    variables, init_s = init_variables(model, make_batch(1, 96, jnp))
    note(f"init {init_s:.0f}s")

    results = {"init_s": round(init_s, 1)}
    best = (0.0, None)
    eval_tf = None

    def provisional(note_str):
        """Emit an interim headline line so a driver kill at ANY point
        mid-run still leaves the latest completed measurements on stdout
        (the last JSON line is always the most complete record)."""
        vps, bb = best
        print(json.dumps({
            "metric": "KSVQE eval videos/sec/chip (96-frame KVQ val "
                      "workload)",
            # bb None = no eval batch has succeeded yet: emit null, not a
            # fake 0.0 measurement (the real error sits in detail.sweep)
            "value": round(vps, 3) if bb is not None else None,
            "unit": "videos/s",
            "vs_baseline": (
                round(vps / A100_REFERENCE_VIDEOS_PER_SEC, 3)
                if bb is not None else None
            ),
            "detail": {"partial": note_str, "best_batch": bb,
                       **({} if bb is not None
                          else {"error": "no eval measurement succeeded"}),
                       "sweep": results},
        }), flush=True)

    def measure_eval_at(B):
        nonlocal eval_tf, best
        note(f"measuring eval B={B}")
        try:
            vps, step_s, compile_s, tf_video, stats = measure(
                B, model, variables
            )
        except Exception as e:  # e.g. HBM OOM at the largest batch
            note(f"eval B={B} failed: {type(e).__name__}: {str(e)[:200]}")
            results[f"B{B}"] = {"error": f"{type(e).__name__}"}
            return
        note(f"eval B={B}: {vps:.1f} videos/s ({step_s * 1000:.1f} ms/step)")
        results[f"B{B}"] = {
            "videos_per_sec": round(vps, 3),
            "step_ms": round(step_s * 1000, 1),
            "compile_s": round(compile_s, 1),
            **stats,
        }
        if tf_video:
            eval_tf = tf_video
        if vps > best[0]:
            best = (vps, B)
        provisional(f"through eval B={B}")

    # B=1 (the serving optimum and, every round so far, the headline
    # number) and the train step are measured FIRST so the two key
    # figures exist on stdout within ~7 min; the rest of the sweep and
    # the e2e phase only enrich the record.
    measure_eval_at(1)

    note("measuring train step B=4 T=32 (in-jit scan differencing)")
    train = None
    try:
        train_vps, train_step_s, train_tf = measure_train(
            variables=variables
        )
        note(f"train: {train_vps:.1f} videos/s "
             f"({train_step_s * 1000:.0f} ms/step)")
        train = {
            "videos_per_sec": round(train_vps, 2),
            "step_ms": round(train_step_s * 1000, 1),
            "batch": 4,
            "frames": 32,
            "train_mfu_pct": round(
                100 * train_vps * TRAIN_TFLOP_PER_VIDEO / V5E_PEAK_TFLOPS, 1
            ),
            "xla_train_tflop_per_video": (
                round(train_tf, 3) if train_tf else None
            ),
            "note": "fwd+bwd, AdamW+EMA, remat off, s2d input; in-jit "
                    "scan-differenced (same methodology as eval)",
        }
    except Exception as e:  # noqa: BLE001 — don't forfeit the eval record
        note(f"train measure failed: {type(e).__name__}: {str(e)[:200]}")
        train = {"error": f"{type(e).__name__}: {str(e)[:200]}"}

    def headline():
        vps, bb = best
        return {
            "metric": "KSVQE eval videos/sec/chip (96-frame KVQ val "
                      "workload)",
            "value": round(vps, 3) if bb is not None else None,
            "unit": "videos/s",
            "vs_baseline": (
                round(vps / A100_REFERENCE_VIDEOS_PER_SEC, 3)
                if bb is not None else None
            ),
            "detail": {
                **({} if bb is not None
                   else {"error": "no eval measurement succeeded"}),
                "device": str(jax.devices()[0]),
                "frames": 96,
                "best_batch": bb,
                "mfu_pct": round(
                    100 * vps * TFLOP_PER_VIDEO / V5E_PEAK_TFLOPS, 1
                ),
                "xla_eval_tflop_per_video": (
                    round(eval_tf, 3) if eval_tf else None
                ),
                "sweep": results,
                "train": train,
                "baseline_note": (
                    "reference publishes no numbers; vs est. "
                    f"{A100_REFERENCE_VIDEOS_PER_SEC} videos/s torch-eager "
                    "A100"
                ),
            },
        }

    # First full headline: eval B=1 + train are in — the round's two key
    # numbers are now un-losable.
    print(json.dumps(headline()), flush=True)

    for B in (4, 8, 16):
        measure_eval_at(B)
        print(json.dumps(headline()), flush=True)

    note(f"measuring end-to-end serving (budget {E2E_BUDGET_S}s)")
    result = headline()
    result["detail"]["e2e"] = run_e2e_timeboxed()
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
