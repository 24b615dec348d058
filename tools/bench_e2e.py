"""End-to-end KSVQE serving throughput: mp4 -> decode -> views -> batched
double-buffered eval on the TPU, through the same public path a user runs
(`KVQDataset` + `Loader` + `Trainer.evaluate`).

This is the north-star workload shape (KVQ val: 96-frame clips, fragment
288x288 + resize 112x112, full KSVQE) measured END TO END — host decode
overlap included — unlike bench.py, which isolates device model time.

Usage: python tools/bench_e2e.py [n_videos] [workers] [eval_batch]

NOTE (this dev box): 1 vCPU with heavy steal — host decode dominates and
absolute numbers are depressed; on a real v5e host (112 vCPUs) decode
parallelism scales with `workers`.  The printed split (host-bound vs
device-bound share) is the portable signal.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from tools.bench_pipeline import make_fixture_videos  # noqa: E402


def run_e2e(n_videos=8, workers=2, eval_batch=4, tiny=False, probe=True):
    """Measure end-to-end serving throughput; returns the result dict
    (or {"error": ...} when the TPU is unreachable)."""
    if tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
        try:
            import jax._src.xla_bridge as _xb

            _xb._clear_backends()
        except Exception:
            pass

    root = "/tmp/kvq_bench_videos"
    names = make_fixture_videos(root, n_videos)
    import os

    # list-form annotations are used verbatim (no data_prefix join)
    anno = [
        dict(filename=os.path.join(root, n), label=float(i + 1), cls_label=0,
             dis_label=i % 4, video_name=n)
        for i, n in enumerate(names)
    ]

    # reference Kwai_KSVQE.yml val shapes: 3 clips x 32 frames as ONE
    # 96-frame clip, fragment 9x9x32 (288px), resize 112.  --tiny swaps in
    # the dryrun-sized KSVQE (__graft_entry__._tiny_ksvqe_config shapes:
    # 40px fragment / 32px resize / T=8) so the harness smoke-runs on CPU.
    sample_types = {
        "technical": dict(
            fragments_h=5, fragments_w=5, fsize_h=8, fsize_w=8,
            size_h=32, size_w=32, aligned=8, clip_len=8,
            frame_interval=2, num_clips=1,
        ) if tiny else dict(
            fragments_h=9, fragments_w=9, fsize_h=32, fsize_w=32,
            size_h=112, size_w=112, aligned=8, clip_len=32,
            frame_interval=4, num_clips=3,
        )
    }
    backbone = {
        "num_samples": 2 if tiny else 1,
        "sample_type": "topkpertubation",
        "CLIP_location": 8,
        "cls_use": True,
        "tuning_stage": 1,
        "a1": 1,
        "a2": 2,
        "checkpoint": False,
        "use_pallas": not tiny,
        # shipped-config default (config/Kwai_KSVQE.yml): host-packed
        # space-to-depth fragments.  Also avoids a pathological XLA
        # compile of the unpacked patch-embed relayout program (measured
        # 405s vs ~40s for the s2d program at the same B=1 shapes, r4).
        "s2d_input": not tiny,
    }
    if tiny:
        backbone.update(
            anchor_size=8, region_k=9, embed_dim=16, depths=[1, 1],
            num_heads=[2, 2], window_size=[2, 7, 7],
            contrique_layers=[1, 1, 1, 1], clip_layers=2, clip_width=64,
            clip_heads=4,
        )
    cfg = {
        "name": "bench_e2e",
        "num_epochs": 1,
        "warmup_epochs": 0,
        "ema": False,
        "save_model": False,
        "batch_size": eval_batch,
        "eval_batch_size": eval_batch,
        "num_workers": workers,
        "seed": 0,
        "ddp": False,
        "load_path": None,
        "data": {
            "val": {
                "type": "KVQDataset",
                "args": {
                    "anno_file": anno,
                    "data_prefix": root,
                    "phase": "test",
                    "sample_types": sample_types,
                },
            }
        },
        "model": {
            "type": "KSVQE",
            "compute_dtype": "float32" if tiny else "bfloat16",
            "args": {
                "KSVQE": {
                    "backbone": backbone,
                    "head": ({"hidden_channels": 16} if tiny else
                             {"in_channels": 768, "hidden_channels": 64}),
                }
            },
        },
        "optimizer": {"lr": 3e-5, "wd": 0.05},
    }

    import jax

    if not tiny and probe:
        # the axon backend HANGS (no error) when the tunnel is down —
        # bounded probe first, same as bench.py
        from bench import probe_tpu

        err = probe_tpu()
        if err is not None:
            return {"error": f"TPU backend unavailable: {err}"}

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")

    from kvq_tpu import runtime
    from kvq_tpu.train.trainer import Trainer

    decode_backend = "native" if runtime.ensure_built() else "numpy/cv2"

    tr = Trainer(cfg, workdir="/tmp/kvq_bench_e2e")
    t0 = time.time()
    tr.build_datasets()
    sample = next(tr.val_loader.epoch(0))
    tr.build_models(sample, seed=0)
    build_s = time.time() - t0

    # pass 1: compiles the eval step + warms decode caches in the OS
    t0 = time.time()
    tr.evaluate()
    warm_s = time.time() - t0

    # pass 2: steady-state end-to-end (host decode re-runs; device cached)
    t0 = time.time()
    tr.evaluate()
    e2e_s = time.time() - t0
    vps = n_videos / e2e_s

    # per-phase attribution (VERDICT r4 #7: measure the bottleneck claim,
    # don't assert it).  Serial, same items as the eval pass: decode =
    # the unique-frame decode alone; views = item total minus decode
    # (mosaic + resize + normalize + pack); h2d = device transfer of the
    # collated batch; device = best-of-3 single eval-step calls (includes
    # the ~30 ms dispatch round-trip — upper bound, labelled as such).
    phases = {}
    try:
        from kvq_tpu.data.decode import decode_views
        from kvq_tpu.data.pipeline import collate
        from kvq_tpu.train.trainer import array_batch
        import numpy as _np

        ds = tr.val_loader.dataset
        k = min(n_videos, 4)
        dec_s = item_s = 0.0
        items = []
        for i in range(k):
            src = ds.source_factory(ds.video_infos[i]["filename"])
            t0 = time.time()
            decode_views(src, ds._samplers(ds._rng(i, 0)), False)
            dec_s += time.time() - t0
            t0 = time.time()
            items.append(ds[i])
            item_s += time.time() - t0
        batch = collate(items[:eval_batch] or items)
        # split host prep (numpy conversion under this box's CPU steal)
        # from the device transfer — lumped, the first r5 run reported an
        # uninterpretable 14.5 s "h2d" (tunnel transfer + host numpy +
        # steal in one bucket)
        t0 = time.time()
        host = array_batch(
            batch, to_device=False,
            view_dtype=getattr(tr, "_view_dtype", None),
        )
        prep_s = time.time() - t0
        t0 = time.time()
        import jax as _jax

        ab = _jax.device_put(host)
        # fence EVERY leaf's transfer; block_until_ready does not
        # synchronize through this tunnel — only readback does
        # (docs/PERF.md methodology traps)
        for v in ab.values():
            if hasattr(v, "ndim") and getattr(v, "size", 0):
                _np.asarray(v[(0,) * v.ndim])
        h2d_s = time.time() - t0
        params = tr.state.params
        dev_best = 1e9
        for _ in range(3):
            t0 = time.time()
            out = tr._eval_step(params, tr.state.batch_stats, ab)
            _np.asarray(out[0] if isinstance(out, tuple) else out)
            dev_best = min(dev_best, time.time() - t0)
        nb = len(items[:eval_batch] or items)
        phases = {
            "decode_ms_per_video": round(dec_s / k * 1e3, 1),
            "views_ms_per_video": round(max(item_s - dec_s, 0.0) / k * 1e3, 1),
            "batch_prep_ms_per_video": round(prep_s / nb * 1e3, 1),
            "h2d_ms_per_video": round(h2d_s / nb * 1e3, 1),
            "device_ms_per_video_incl_dispatch": round(
                dev_best / nb * 1e3, 1
            ),
        }
    except Exception as e:  # noqa: BLE001 — attribution is auxiliary
        phases = {"error": f"{type(e).__name__}: {str(e)[:120]}"}

    return {
        "metric": "KSVQE end-to-end eval videos/s (decode+views+device)",
        "value": round(vps, 3),
        "unit": "videos/s",
        "detail": {
            "n_videos": n_videos,
            "workers": workers,
            "eval_batch": eval_batch,
            "decode_backend": decode_backend,
            "build_s": round(build_s, 1),
            "first_pass_s": round(warm_s, 1),
            "steady_pass_s": round(e2e_s, 1),
            "phases": phases,
            "note": "host-bound on this dev box: decode+views pay 1-vCPU "
                    "CPU steal and H2D crosses the remote-execution tunnel "
                    "at ~10-30 MB/s (PCIe-attached on real TPU hosts); "
                    "decode parallelism scales with workers",
        },
    }


def main():
    args = [a for a in sys.argv[1:] if a != "--tiny"]
    tiny = "--tiny" in sys.argv[1:]  # CPU smoke: tiny KSVQE + tiny shapes
    n_videos = int(args[0]) if len(args) > 0 else (2 if tiny else 8)
    workers = int(args[1]) if len(args) > 1 else 2
    eval_batch = int(args[2]) if len(args) > 2 else (1 if tiny else 4)
    print(json.dumps(run_e2e(n_videos, workers, eval_batch, tiny=tiny)))


if __name__ == "__main__":
    main()
