"""Adjudicate the experimental kernel knobs on TPU (VERDICT r3 item 4).

A/B-times each env-gated knob at the dominant KSVQE geometries:

  - KVQ_EXP2 (SOFTMAX_EXP2): base-2 softmax with the log2(e) prescale
    folded into q-scale/bias slabs — eval block kernel AND train
    fwd+bwd.
  - KVQ_MXU_SUM (MXU_ROWSUM): probability row sums via a ones-column on
    the p@v matmul — eval block kernel.
  - KVQ_BWD_PNFOLD (BWD_PNFOLD): bwd normalization folded onto the
    (N, hd) dout tile instead of materializing pn — train bwd.

Gradient/value exactness of every knob is pinned by
tests/test_kernel_knobs.py; this tool measures whether any of them is
actually faster.  Winners become defaults; losers get recorded as dead
ends in docs/PERF.md and deleted.

Eval rows time fused_swin_block at eval shapes (B x T=96); train rows
time value_and_grad of train_swin_block at train shapes (B=4 x T=32).
Knobs are flipped by reassigning the module globals the kernels read at
trace time (exactly what tests/test_kernel_knobs.py does) — each timing
uses a fresh jit so nothing is cached across variants.

Usage: python tools/profile_kernel_knobs.py [B_eval]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from tools.profile_ksvqe import timed_loop  # noqa: E402


def set_knob(WA, jnp, knob, on):
    if knob == "exp2":
        WA.SOFTMAX_EXP2 = on
        WA._pexp = jnp.exp2 if on else jnp.exp
        WA._FOLD_CLAMP = 86.0 if on else 60.0
    elif knob == "mxu_rowsum":
        WA.MXU_ROWSUM = on
    elif knob == "pnfold":
        WA.BWD_PNFOLD = on
    else:
        raise ValueError(knob)


def stage_inputs(C, h, dims, B, jnp, dt):
    rng = np.random.default_rng(0)
    window = (8, 7, 7)
    D, H, W = dims
    wd = (min(window[0], D), min(window[1], H), min(window[2], W))
    Nw = wd[0] * wd[1] * wd[2]
    nW = (D // wd[0]) * (H // wd[1]) * (W // wd[2])
    BW = B * nW
    hidden = 4 * C
    params = {
        "norm1_scale": jnp.ones((C,), jnp.float32),
        "norm1_bias": jnp.zeros((C,), jnp.float32),
        "qkv_w": jnp.asarray(rng.normal(size=(C, 3 * C), scale=0.02), dt),
        "qkv_b": jnp.zeros((3 * C,), jnp.float32),
        "proj_w": jnp.asarray(rng.normal(size=(C, C), scale=0.02), dt),
        "proj_b": jnp.zeros((C,), jnp.float32),
        "norm2_scale": jnp.ones((C,), jnp.float32),
        "norm2_bias": jnp.zeros((C,), jnp.float32),
        "fc1_w": jnp.asarray(rng.normal(size=(C, hidden), scale=0.02), dt),
        "fc1_b": jnp.zeros((hidden,), jnp.float32),
        "fc2_w": jnp.asarray(rng.normal(size=(hidden, C), scale=0.02), dt),
        "fc2_b": jnp.zeros((C,), jnp.float32),
    }
    rel = jnp.asarray(rng.normal(size=(h, Nw, Nw)), jnp.float32)
    frag = jnp.asarray(rng.normal(size=(h, Nw, Nw)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(BW, Nw, C)), dt)
    return params, rel, frag, x, wd, BW, Nw


def main():
    import jax
    import jax.numpy as jnp

    from kvq_tpu.ops import window_attention as WA
    from kvq_tpu.ops.window_attention import (
        WindowGeometry,
        fused_swin_block,
        train_swin_block,
    )

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")
    B_eval = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    dt = jnp.bfloat16

    eval_stages = [  # (C, heads, dims) at T=96 eval shapes
        (96, 3, (48, 56, 56)),
        (192, 6, (48, 28, 28)),
        (384, 12, (48, 14, 14)),
        (768, 24, (48, 7, 7)),
    ]
    train_stages = [  # stages 0-2 take the fused train kernel, B=4 T=32
        (96, 3, (16, 56, 56)),
        (192, 6, (16, 28, 28)),
        (384, 12, (16, 14, 14)),
    ]

    # loop counts per stage: the C>=384 kernels run in ~0.2-0.3 ms, at the
    # noise floor of 5-iteration differencing through the tunnel — use
    # longer in-jit loops there so the differenced quantity is >~2 ms.
    # KVQ_PROF_LOOPS="n1,n2" overrides for high-precision re-runs;
    # KVQ_PROF_STAGES="96,192" restricts the stage set.
    import os

    loops_env = os.environ.get("KVQ_PROF_LOOPS")

    def loops(C):
        if loops_env:
            a, b = loops_env.split(",")
            return (int(a), int(b))
        return {96: (1, 5), 192: (2, 10)}.get(C, (4, 20))

    stages_env = os.environ.get("KVQ_PROF_STAGES")
    if stages_env:
        keep = {int(c) for c in stages_env.split(",")}
        eval_stages = [s for s in eval_stages if s[0] in keep]
        train_stages = [s for s in train_stages if s[0] in keep]

    only = sys.argv[2] if len(sys.argv) > 2 else ""

    if "eval" in only or not only:
        print("== EVAL fused_swin_block (frag+shift) ==", flush=True)
        for knob in ("exp2", "mxu_rowsum"):
            for C, h, dims in eval_stages:
                params, rel, frag, x, wd, BW, Nw = stage_inputs(
                    C, h, dims, B_eval, jnp, dt
                )
                # fragments (1,7,7): the model's KSVQE geometry
                # (nn/swin.py fragments_hw=7)
                geo = WindowGeometry(
                    batch=B_eval, dims=dims, window=wd,
                    shift=(4, 3, 3), fragments=(1, 7, 7),
                    num_heads=h, head_dim=C // h, use_frag=True,
                )
                n1, n2 = loops(C)
                times = {}
                try:
                    for on in (False, True):
                        set_knob(WA, jnp, knob, on)

                        # every array rides the loop args: closed-over
                        # device arrays become program CONSTANTS, which
                        # Mosaic places on the kernel's scoped-vmem stack
                        # (measured: the C=384 train bwd kernel compiles
                        # as-args but scoped-vmem-OOMs as-constants)
                        def fn(vs, inp, g=geo):
                            xx, p, r, f = inp
                            return fused_swin_block(
                                xx, p, r, f, g, scale=(C // h) ** -0.5
                            )

                        times[on] = timed_loop(
                            fn, {}, (x, params, rel, frag), n1=n1, n2=n2
                        )
                except Exception as e:  # noqa: BLE001 — keep profiling
                    print(f"eval  {knob:10s} C={C:4d}: "
                          f"FAILED {type(e).__name__}: {str(e)[:120]}",
                          flush=True)
                    continue
                finally:
                    set_knob(WA, jnp, knob, False)
                d = (times[False] - times[True]) / times[False] * 100
                print(
                    f"eval  {knob:10s} C={C:4d}: "
                    f"off {times[False]*1e3:7.2f} ms"
                    f"  on {times[True]*1e3:7.2f} ms  ({d:+5.1f}%)",
                    flush=True,
                )

    if "train" in only or not only:
        print("== TRAIN train_swin_block fwd+bwd (frag+shift) ==",
              flush=True)
        for knob in ("exp2", "pnfold"):
            for C, h, dims in train_stages:
                params, rel, frag, x, wd, BW, Nw = stage_inputs(
                    C, h, dims, 4, jnp, dt
                )
                geo = WindowGeometry(
                    batch=4, dims=dims, window=wd,
                    shift=(4, 3, 3), fragments=(1, 7, 7),
                    num_heads=h, head_dim=C // h, use_frag=True,
                )
                dp1 = jnp.ones((x.shape[0], 1), jnp.float32)
                dp2 = jnp.ones((x.shape[0], 1), jnp.float32)
                n1, n2 = loops(C)
                times = {}
                try:
                    for on in (False, True):
                        set_knob(WA, jnp, knob, on)

                        # dp1/dp2 ride the args too — as constants they
                        # land on the kernel's scoped-vmem stack and the
                        # C=384 bwd kernel fails to compile (see eval note)
                        def loss(diff, dps, g=geo):
                            xx, p, r, f = diff
                            d1, d2 = dps
                            out = train_swin_block(
                                xx, p, r, f, g, d1, d2,
                                scale=(C // h) ** -0.5,
                            )
                            return jnp.sum(out.astype(jnp.float32))

                        vag = jax.value_and_grad(loss, argnums=0)

                        def fn(vs, inp):
                            diff, dps = inp
                            v, g = vag(diff, dps)
                            return (v, g)

                        times[on] = timed_loop(
                            fn, {},
                            ((x, params, rel, frag), (dp1, dp2)),
                            n1=n1, n2=n2,
                        )
                except Exception as e:  # noqa: BLE001 — keep profiling
                    print(f"train {knob:10s} C={C:4d}: "
                          f"FAILED {type(e).__name__}: {str(e)[:120]}",
                          flush=True)
                    continue
                finally:
                    set_knob(WA, jnp, knob, False)
                d = (times[False] - times[True]) / times[False] * 100
                print(
                    f"train {knob:10s} C={C:4d}: "
                    f"off {times[False]*1e3:7.2f} ms"
                    f"  on {times[True]*1e3:7.2f} ms  ({d:+5.1f}%)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
