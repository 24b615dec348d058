#!/usr/bin/env python
"""Seek vs grab-scan decode for sparse frame patterns (VERDICT r4 #7).

Relative comparison in ONE process, best-of-N (this box's CPU steal makes
absolute host numbers meaningless — docs/PERF.md trap note).  Patterns
mirror the KVQ shapes: the eval request (3 x 32-frame clips, interval 4)
spread across a long video, a single clip deep into the video, and a
dense head window (where seeking cannot help and must not hurt).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_long_video(path, n=1200, wh=(640, 360)):
    import cv2

    w = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 30, wh
    )
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(wh[1], wh[0], 3), dtype=np.uint8)
    for i in range(n):
        f = np.roll(base, i * 3, axis=1).copy()
        f[:20, :20] = i % 255
        w.write(f)
    w.release()


def patterns(n):
    def clip(start, l=32, interval=4):
        return list(range(start, start + l * interval, interval))

    return {
        "kvq_eval_3clips": clip(50) + clip(450) + clip(900),
        "deep_single_clip": clip(1000),
        "dense_head": list(range(96)),
    }


def main():
    from kvq_tpu.data.decode import OpenCVVideoSource

    path = "/tmp/kvq_seek_fixture.mp4"
    import os

    if not os.path.exists(path):
        make_long_video(path)
    for name, idx in patterns(1200).items():
        idx = np.asarray(idx)
        res = {}
        for mode in ("never", "always"):
            best = 1e9
            for _ in range(5):
                src = OpenCVVideoSource(path, seek=mode)
                t0 = time.time()
                src.get_frames(idx)
                best = min(best, time.time() - t0)
            res[mode] = best
        print(
            f"{name:20s} scan {res['never']*1e3:8.1f} ms   "
            f"seek {res['always']*1e3:8.1f} ms   "
            f"({res['never']/res['always']:.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
