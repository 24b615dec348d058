"""Host input-pipeline throughput: mp4 decode -> samplers -> views.

The serving north-star is decode-bound (SURVEY.md §7.3): per video the KVQ
eval path decodes 96 unique frames and builds the fragment mosaic + resize
view.  This tool measures that host path (threads x videos/s) through the
same ``KVQDataset``/``Loader`` the trainer uses, with the C++ runtime when
built (``sh kvq_tpu/runtime/build.sh``) and the numpy path otherwise.

Usage: python tools/bench_pipeline.py [n_videos] [workers]

NOTE: the axon dev box exposes a SINGLE CPU core (nproc=1), so absolute
numbers here are not representative — decode and mosaic are embarrassingly
parallel across videos and scale with host cores on a real TPU-VM host
(v5e hosts have 112 vCPUs).  Use this tool for relative comparisons
(native C++ runtime vs numpy path) and for regression tracking only.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_fixture_videos(root: str, n: int, frames: int = 140,
                        w: int = 960, h: int = 540) -> list[str]:
    import cv2

    os.makedirs(root, exist_ok=True)
    names = []
    for i in range(n):
        path = os.path.join(root, f"bench_{i}.mp4")
        names.append(f"bench_{i}.mp4")
        if os.path.exists(path):
            continue
        vw = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h)
        )
        rng = np.random.default_rng(i)
        base = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        for t in range(frames):
            frame = np.roll(base, t * 3, axis=1)
            cv2.circle(frame, (w // 2, h // 2), 40 + t % 60, (0, 0, 255), -1)
            vw.write(frame)
        vw.release()
    return names


def main():
    from kvq_tpu.data.datasets import KVQDataset
    from kvq_tpu.data.pipeline import Loader
    from kvq_tpu import runtime as native

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    root = "/tmp/kvq_bench_videos"
    names = make_fixture_videos(root, n)

    opt = {
        "anno_file": [
            dict(filename=os.path.join(root, nm), label=3.0, cls_label=0,
                 dis_label=0, video_name=nm)
            for nm in names
        ],
        "data_prefix": root,
        "phase": "test",
        "sample_types": {
            "technical": dict(
                fragments_h=9, fragments_w=9, fsize_h=32, fsize_w=32,
                size_h=112, size_w=112, aligned=8,
                clip_len=32, frame_interval=4, num_clips=3,
            )
        },
    }
    ds = KVQDataset(opt)
    loader = Loader(ds, batch_size=4, num_workers=workers, shuffle=False)

    # warm one item (file-system cache, lazy imports)
    _ = ds[0]

    t0 = time.time()
    seen = 0
    for batch in loader:
        seen += batch["fragment"].shape[0]
    dt = time.time() - t0
    print(
        f"native_runtime={native.available()} workers={workers} "
        f"videos={seen} wall={dt:.2f}s -> {seen / dt:.2f} videos/s host "
        f"(96 decoded frames + fragment mosaic + resize view per video)"
    )


if __name__ == "__main__":
    main()
