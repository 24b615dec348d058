"""Offline SlowFast motion-feature extraction — counterpart of reference
SlowFast_features.py.

Per video: decode all frames, resize to 224, normalize
((x/255 - 0.45)/0.225), chop into per-second 32-frame clips (pad-repeat,
minimum 8 clips; fps==0 -> 10 clips guard, SlowFast_features.py:64-105),
run SlowFast-R50, save ``feature_<k>_slow_feature.npy`` (2048-d) and
``feature_<k>_fast_feature.npy`` (256-d) per clip (:191-197).

    python -m kvq_tpu.cli.slowfast_features \
        --videos_csv list.csv --video_root /data/videos --out /data/feat
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np

from ..data import views as V
from ..nn.slowfast import SlowFastR50, pack_pathways


def video_to_clips(frames: np.ndarray, fps: int, resize: int = 224):
    """(T,H,W,C) uint8 -> list of (32, resize, resize, 3) float clips."""
    import cv2

    n = len(frames)
    clip_len = 32
    n_clips = 10 if fps == 0 else int(n / fps)
    n_clips_min = 8
    resized = np.stack(
        [cv2.resize(f, (resize, resize), interpolation=cv2.INTER_LINEAR)
         for f in frames]
    ).astype(np.float32)
    resized = V.normalize(resized, "slowfast")
    clips = []
    for i in range(n_clips):
        start = i * fps
        clip = np.zeros((clip_len, resize, resize, 3), np.float32)
        avail = resized[start : start + clip_len]
        clip[: len(avail)] = avail
        if len(avail) < clip_len and len(avail) > 0:
            clip[len(avail) :] = avail[-1]
        clips.append(clip)
    while len(clips) < n_clips_min and clips:
        clips.append(clips[-1])
    return clips


def extract_features(model, variables, clips, jitted_apply):
    feats = []
    for clip in clips:
        slow, fast = pack_pathways(clip[None])
        s, f = jitted_apply(variables, slow, fast)
        feats.append((np.asarray(s)[0], np.asarray(f)[0]))
    return feats


def main(argv=None):
    import cv2
    import jax

    p = argparse.ArgumentParser("kvq_tpu slowfast_features")
    p.add_argument("--videos_csv", required=True, help="csv w/ header, col0=name")
    p.add_argument("--video_root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--resize", type=int, default=224)
    p.add_argument("--load_path", default=None, help="converted SlowFast ckpt")
    args = p.parse_args(argv)

    names = []
    with open(args.videos_csv, newline="") as f:
        r = csv.reader(f)
        next(r)
        for row in r:
            names.append(row[0])

    model = SlowFastR50()
    variables = None

    @jax.jit
    def apply(vs, slow, fast):
        return model.apply(vs, slow, fast, train=False)

    for name in names:
        path = os.path.join(args.video_root, name)
        cap = cv2.VideoCapture(path)
        fps = int(round(cap.get(cv2.CAP_PROP_FPS)))
        frames = []
        while True:
            ok, fr = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB))
        cap.release()
        if not frames:
            print("skipping (no frames):", name)
            continue
        frames = np.stack(frames)
        clips = video_to_clips(frames, fps, args.resize)
        if variables is None:
            slow, fast = pack_pathways(clips[0][None])
            variables = model.init(jax.random.key(0), slow, fast, train=False)
            if args.load_path:
                from ..core import checkpoint as ckpt

                loaded = ckpt.load_checkpoint(args.load_path)
                merged, report = ckpt.merge_params(
                    variables["params"], loaded.get("params", loaded)
                )
                variables = dict(variables, params=merged)
                # converted checkpoints carry the BN running stats the
                # frozen eval-mode model depends on
                if loaded.get("batch_stats"):
                    stats, _ = ckpt.merge_params(
                        variables["batch_stats"], loaded["batch_stats"]
                    )
                    variables = dict(variables, batch_stats=stats)
        out_dir = os.path.join(args.out, name)
        os.makedirs(out_dir, exist_ok=True)
        for k, (s, f) in enumerate(
            extract_features(model, variables, clips, apply)
        ):
            np.save(os.path.join(out_dir, f"feature_{k}_slow_feature.npy"), s)
            np.save(os.path.join(out_dir, f"feature_{k}_fast_feature.npy"), f)
        print("done:", name, len(clips), "clips")


if __name__ == "__main__":
    main()
