"""Benchmark: KSVQE inference throughput on one TPU chip, paper shapes.

Measures the reference's eval workload (config/Kwai_KSVQE.yml val):
96-frame clips (num_clips=3 x clip_len=32 fed as ONE clip — the
reference's eval path, SURVEY.md §5.1.3), fragment 288x288 + resize
112x112, full KSVQE (CLIP ViT-B/16 + CONTRIQUE R50 + QRS + Swin-T-3D +
CDM) + VQAHead, bfloat16 compute.

Prints ONE json line: videos/sec/chip, with vs_baseline relative to an
estimated reference throughput on A100 (the reference publishes no
numbers — BASELINE.md; the estimate below is documented and adjustable).
"""

import json
import time

import numpy as np

# Estimated reference (torch eager, A100, batch 1, eval path) KSVQE
# throughput.  Derivation: ~0.5 TFLOP/video (Video-Swin-T 96f ~264 GF +
# CONTRIQUE 2352x32x32 patches ~200 GF + CLIP 4 keyframes ~18 GF), torch
# eager eval-batch-1 on A100 sustains ~10-15% MFU on this mix of small
# kernels => ~2-4 videos/s.  Point estimate:
A100_REFERENCE_VIDEOS_PER_SEC = 3.0


def main():
    import jax
    import jax.numpy as jnp

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
                        "checkpoint": False,  # eval: no remat needed
                        "use_pallas": True,
                    },
                    "head": {"in_channels": 768, "hidden_channels": 64},
                }
            },
        }
    }

    B, T = 1, 96  # one video per step, reference eval quirk shapes
    rng = np.random.default_rng(0)
    batch = {
        "fragment": jnp.asarray(
            rng.normal(size=(B, T, 288, 288, 3)), jnp.bfloat16
        ),
        "resize_video": jnp.asarray(
            rng.normal(size=(B, T, 112, 112, 3)), jnp.bfloat16
        ),
        "dis_label": jnp.zeros((B,), jnp.int32),
    }

    model = VQANetwork(config=config)
    t0 = time.time()
    variables = model.init(
        {"params": jax.random.key(0), "qrs": jax.random.key(1)},
        batch,
        train=False,
    )
    init_s = time.time() - t0

    @jax.jit
    def eval_step(vs, b):
        scores, _ = model.apply(vs, b, train=False, reduce_scores=True)
        return scores

    t0 = time.time()
    out = eval_step(variables, batch)
    out.block_until_ready()
    compile_s = time.time() - t0

    # warmup + timed
    for _ in range(2):
        eval_step(variables, batch).block_until_ready()
    n_iters = 10
    t0 = time.time()
    for _ in range(n_iters):
        out = eval_step(variables, batch)
    out.block_until_ready()
    elapsed = time.time() - t0

    videos_per_sec = B * n_iters / elapsed
    result = {
        "metric": "KSVQE eval videos/sec/chip (96-frame KVQ val workload)",
        "value": round(videos_per_sec, 3),
        "unit": "videos/s",
        "vs_baseline": round(videos_per_sec / A100_REFERENCE_VIDEOS_PER_SEC, 3),
        "detail": {
            "device": str(jax.devices()[0]),
            "batch": B,
            "frames": T,
            "init_s": round(init_s, 1),
            "compile_s": round(compile_s, 1),
            "step_ms": round(1000 * elapsed / n_iters, 1),
            "baseline_note": (
                "reference publishes no numbers; vs est. "
                f"{A100_REFERENCE_VIDEOS_PER_SEC} videos/s torch-eager A100"
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
