"""Video decode service.

The reference decodes with decord (random access, unique-frame decode,
fusion_datasets.py:467-478) and falls back to full-sequential cv2 decode
(:485-515).  decord is not available here; the primary backend is cv2
(FFmpeg under the hood) with the same *unique-frame-decode* optimization:
frames are decoded sequentially but only requested indices are retained, and
decoding stops at the last requested index.

A synthetic in-memory source is provided for hermetic tests (SURVEY.md §4
"Implication for the rebuild").  A native C++ decode/mosaic worker pool will
back this interface in `kvq_tpu/runtime/` for production throughput.
"""

from __future__ import annotations

from typing import Mapping, Protocol

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


class VideoSource(Protocol):
    def num_frames(self) -> int: ...

    def get_frames(self, indices: np.ndarray) -> np.ndarray:
        """Return (len(indices), H, W, 3) uint8 RGB frames."""
        ...


class SyntheticVideoSource:
    """Deterministic procedural video for hermetic tests.

    Frames are generated from a per-(video, frame) hash so any frame is
    randomly accessible without state.
    """

    def __init__(self, n_frames: int, height: int, width: int, seed: int = 0):
        self._n = n_frames
        self._h = height
        self._w = width
        self._seed = seed

    def num_frames(self) -> int:
        return self._n

    def get_frames(self, indices: np.ndarray) -> np.ndarray:
        out = np.empty((len(indices), self._h, self._w, 3), dtype=np.uint8)
        for k, idx in enumerate(np.asarray(indices)):
            rng = np.random.default_rng((self._seed, int(idx)))
            out[k] = rng.integers(0, 256, size=(self._h, self._w, 3), dtype=np.uint8)
        return out


class OpenCVVideoSource:
    """cv2-backed decoder with unique-frame retention.

    Short videos are pad-repeated with the last frame to >130 frames to
    match reference fusion_datasets.py:413-415 when ``pad_short`` is set.
    """

    def __init__(self, path: str, pad_short: int | None = None):
        if cv2 is None:
            raise RuntimeError("cv2 unavailable; cannot decode video files")
        self.path = path
        self.pad_short = pad_short
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise IOError(f"cannot open video {path}")
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        self._n_raw = max(n, 0)
        self._frames: np.ndarray | None = None

    def num_frames(self) -> int:
        n = self._n_raw
        if self.pad_short is not None and 0 < n <= self.pad_short:
            return self.pad_short + 1
        return n

    def _decode_all(self) -> np.ndarray:
        cap = cv2.VideoCapture(self.path)
        frames = []
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        cap.release()
        if not frames:
            raise IOError(f"no frames decoded from {self.path}")
        if self.pad_short is not None:
            while len(frames) <= self.pad_short:
                frames.append(frames[-1])
        return np.stack(frames)

    def get_frames(self, indices: np.ndarray) -> np.ndarray:
        # cv2 random seek is unreliable on many codecs; decode sequentially
        # up to max(indices) once and cache (per-sample lifetime), mirroring
        # the reference's decode-each-unique-frame-once strategy.
        if self._frames is None:
            self._frames = self._decode_all()
        idx = np.clip(np.asarray(indices), 0, len(self._frames) - 1)
        return self._frames[idx]


def open_video(path_or_source, pad_short: int | None = None) -> VideoSource:
    if isinstance(path_or_source, (SyntheticVideoSource, OpenCVVideoSource)):
        return path_or_source
    if hasattr(path_or_source, "get_frames"):
        return path_or_source
    # prefer the native C++ decode service when built
    try:
        from .. import runtime

        if runtime.available():
            return runtime.NativeVideoSource(str(path_or_source), pad_short)
    except Exception:
        pass
    return OpenCVVideoSource(str(path_or_source), pad_short=pad_short)


def decode_views(
    source: VideoSource,
    samplers: Mapping[str, object],
    is_train: bool = False,
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Sample frame indices per view and decode each unique frame once.

    Returns ``(videos, frame_inds)`` with videos channels-last (T,H,W,C)
    uint8.  Mirrors reference spatial_temporal_view_decomposition
    (fusion_datasets.py:449-524) minus the torch/decord machinery.
    """
    n = source.num_frames()
    frame_inds = {k: s(n, is_train) for k, s in samplers.items()}  # type: ignore[operator]
    all_inds = np.unique(np.concatenate(list(frame_inds.values())))
    decoded = source.get_frames(all_inds)
    lookup = {int(i): decoded[k] for k, i in enumerate(all_inds)}
    videos = {
        k: np.stack([lookup[int(i)] for i in inds]) for k, inds in frame_inds.items()
    }
    return videos, frame_inds


def decode_views_ms(
    source: VideoSource,
    sample_types: Mapping[str, dict],
    samplers: Mapping[str, object],
    is_train: bool = False,
    rng: "np.random.Generator | None" = None,
) -> tuple[dict[str, dict], dict[str, np.ndarray]]:
    """Multi-scale view decomposition (reference
    spatial_temporal_view_decomposition_ms, fusion_datasets.py:527-604 —
    unused by any shipped config; rebuilt for surface parity).

    For each sample type returns ``{'scale1': <configured fsize view>,
    'scale2': <64x64-fragment view>, 'res': min(H, W)}``.
    """
    from .views import get_single_view

    videos, frame_inds = decode_views(source, samplers, is_train)
    sampled: dict[str, dict] = {}
    for stype, sopt in sample_types.items():
        video = videos[stype]
        sopt2 = dict(sopt)
        sopt2.update(fsize_h=64, fsize_w=64)
        sampled[stype] = {
            "scale1": get_single_view(video, stype, rng=rng, **sopt),
            "scale2": get_single_view(video, stype, rng=rng, **sopt2),
            "res": int(min(video.shape[1], video.shape[2])),
        }
    return sampled, frame_inds
