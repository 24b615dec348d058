"""OpenCVVideoSource decord-parity scan: grab/skip + early stop at the
highest requested index (reference decodes only requested unique frames,
fusion_datasets.py:467-478)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from kvq_tpu.data.decode import OpenCVVideoSource


@pytest.fixture()
def small_video(tmp_path):
    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (64, 48)
    )
    for i in range(40):
        w.write(np.full((48, 64, 3), (i * 6) % 255, np.uint8))
    w.release()
    return path


def test_early_stop_and_selective_retain(small_video):
    src = OpenCVVideoSource(small_video)
    frames = src.get_frames(np.array([2, 7, 7, 11]))
    assert frames.shape == (4, 48, 64, 3)
    # MJPG on constant frames: small quantization offset tolerated
    assert abs(frames[0].mean() - 12) < 4
    assert abs(frames[3].mean() - 66) < 4
    # scan stopped right after index 11 and retained only requested frames
    assert src._pos == 12
    assert sorted(src._cache) == [2, 7, 11]


def test_backward_request_reopens(small_video):
    src = OpenCVVideoSource(small_video)
    a = src.get_frames(np.array([10]))
    b = src.get_frames(np.array([3]))  # behind the scan position -> reopen
    assert sorted(src._cache) == [3, 10]
    np.testing.assert_array_equal(a[0], src.get_frames(np.array([10]))[0])
    assert abs(b[0].mean() - 18) < 4


def test_pad_short_clamps_to_last_frame(small_video):
    src = OpenCVVideoSource(small_video, pad_short=130)
    assert src.num_frames() == 131
    frames = src.get_frames(np.array([39, 200]))
    np.testing.assert_array_equal(frames[0], frames[1])


def test_overcounted_metadata_clamps(small_video):
    src = OpenCVVideoSource(small_video)
    src._n_raw = 60  # simulate a lying container header
    frames = src.get_frames(np.array([5, 55]))
    assert frames.shape == (2, 48, 64, 3)
    # EOF discovered at 40; index 55 clamped to the real last frame
    assert src._n_raw == 40
    ref_last = src.get_frames(np.array([39]))[0]
    np.testing.assert_array_equal(frames[1], ref_last)


def test_zero_metadata_frame_count_recounts(small_video, monkeypatch):
    """Containers reporting CAP_PROP_FRAME_COUNT=0 (VFR/webm/streams) must
    not freeze the clip on frame 0 — the source grab()-counts the true
    length instead of clamping every index to the bogus metadata."""
    from kvq_tpu.data import decode as D

    real_cap = D.cv2.VideoCapture

    class NoCount:  # composition: subclassing cv2.VideoCapture segfaults at GC
        def __init__(self, path):
            self._c = real_cap(path)

        def get(self, prop):
            if prop == D.cv2.CAP_PROP_FRAME_COUNT:
                return 0.0
            return self._c.get(prop)

        def __getattr__(self, name):
            return getattr(self._c, name)

    monkeypatch.setattr(D.cv2, "VideoCapture", NoCount)
    src = OpenCVVideoSource(small_video)
    assert src._n_raw == 40
    frames = src.get_frames(np.array([0, 20, 39]))
    # distinct luminance ramp frames, not frame 0 repeated
    assert abs(frames[0].mean() - 0) < 4
    assert abs(frames[1].mean() - 120) < 4
    assert abs(frames[2].mean() - 234) < 4
