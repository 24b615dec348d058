"""ctypes bindings for the native host runtime (libkvq_runtime.so).

Gracefully degrades: when the shared library is absent (not built), the
pure-python/numpy paths in kvq_tpu.data are used instead.  Build with
``sh kvq_tpu/runtime/build.sh``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libkvq_runtime.so")
_lib = None


def load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.kvq_open_video.restype = ctypes.c_void_p
    lib.kvq_open_video.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.kvq_video_frames.restype = ctypes.c_int
    lib.kvq_video_frames.argtypes = [ctypes.c_void_p]
    lib.kvq_video_fps.restype = ctypes.c_double
    lib.kvq_video_fps.argtypes = [ctypes.c_char_p]
    lib.kvq_decode_frames.restype = ctypes.c_int64
    lib.kvq_decode_frames.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.kvq_close_video.argtypes = [ctypes.c_void_p]
    lib.kvq_fragment_mosaic.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.kvq_resize_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def ensure_built(timeout: float = 180.0) -> bool:
    """Build ``libkvq_runtime.so`` in place if it is absent.

    The reference ships its native decode path as a pip dependency
    (decord, requirements.txt); ours ships as source, so entry points
    (test runner, benches) call this to get the production decode path
    without a manual build step.  Graceful: returns False (numpy
    fallback stays active) when the toolchain or OpenCV headers are
    missing or the build times out.
    """
    if available():
        return True
    import subprocess

    script = os.path.join(os.path.dirname(__file__), "build.sh")
    try:
        r = subprocess.run(
            ["sh", script], capture_output=True, text=True, timeout=timeout
        )
    except (OSError, subprocess.TimeoutExpired):
        return False
    if r.returncode != 0:
        return False
    return available()


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


class NativeVideoSource:
    """Decode-service handle matching kvq_tpu.data.decode.VideoSource."""

    def __init__(self, path: str, pad_short: int | None = 130):
        lib = load()
        if lib is None:
            raise RuntimeError("libkvq_runtime.so not built")
        self._lib = lib
        self._h = lib.kvq_open_video(
            path.encode(), int(pad_short or 0)
        )
        if not self._h:
            raise IOError(f"cannot open video {path}")

    def num_frames(self) -> int:
        return self._lib.kvq_video_frames(self._h)

    def get_frames(self, indices) -> np.ndarray:
        idx = np.ascontiguousarray(indices, dtype=np.int32)
        # n=0 probe call: decodes (cached) and returns dims without writing
        probe = np.zeros(1, np.uint8)
        hw = self._lib.kvq_decode_frames(
            self._h, _ptr(idx[:1], ctypes.c_int32), 0, _ptr(probe, ctypes.c_uint8)
        )
        if hw < 0:
            raise IOError("decode failed")
        H, W = int(hw >> 16), int(hw & 0xFFFF)
        out = np.empty((len(idx), H, W, 3), np.uint8)
        hw = self._lib.kvq_decode_frames(
            self._h, _ptr(idx, ctypes.c_int32), len(idx), _ptr(out, ctypes.c_uint8)
        )
        if hw < 0:
            raise IOError("decode failed")
        return out

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.kvq_close_video(self._h)
            self._h = None


def fragment_mosaic_normalize(
    video: np.ndarray,
    ymap: np.ndarray,
    xmap: np.ndarray,
    aligned: int,
    mean: np.ndarray,
    std: np.ndarray,
    n_threads: int = 4,
) -> np.ndarray:
    """Fused native mosaic gather + normalize.  video (T,H,W,3) uint8."""
    lib = load()
    T, H, W, _ = video.shape
    tg, oh, ow = ymap.shape
    video = np.ascontiguousarray(video)
    ymap32 = np.ascontiguousarray(ymap, np.int32)
    xmap32 = np.ascontiguousarray(xmap, np.int32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((T, oh, ow, 3), np.float32)
    lib.kvq_fragment_mosaic(
        _ptr(video, ctypes.c_uint8), T, H, W,
        _ptr(ymap32, ctypes.c_int32), _ptr(xmap32, ctypes.c_int32),
        tg, aligned, oh, ow,
        _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
        _ptr(out, ctypes.c_float), n_threads,
    )
    return out


def resize_normalize(
    video: np.ndarray,
    oh: int,
    ow: int,
    mean: np.ndarray,
    std: np.ndarray,
    div255: bool,
    n_threads: int = 4,
) -> np.ndarray:
    lib = load()
    T, H, W, _ = video.shape
    video = np.ascontiguousarray(video)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((T, oh, ow, 3), np.float32)
    lib.kvq_resize_normalize(
        _ptr(video, ctypes.c_uint8), T, H, W, oh, ow,
        _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
        1 if div255 else 0, _ptr(out, ctypes.c_float), n_threads,
    )
    return out
