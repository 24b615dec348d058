"""Seek+scan decode (data/decode.py:OpenCVVideoSource): the seek path
must return bit-identical frames to the pure grab-scan path (reference
random-access parity, fusion_datasets.py:467-478)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from kvq_tpu.data.decode import OpenCVVideoSource, _SEEK_MIN_SKIP


@pytest.fixture(scope="module")
def fixture_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vids") / "seek.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (96, 64))
    rng = np.random.default_rng(0)
    for i in range(300):
        f = rng.integers(0, 255, size=(64, 96, 3), dtype=np.uint8)
        # per-frame signature block so frame identity is checkable
        f[:16, :16] = (i * 7) % 255
        w.write(f)
    w.release()
    return path


@pytest.mark.parametrize(
    "indices",
    [
        [5, 100, 180, 290],                        # sparse: every gap seeks
        list(range(150, 182)),                     # dense window deep in
        [0, 1, 2, 3],                              # dense head: no seek
        [10, 10 + _SEEK_MIN_SKIP, 280, 281, 282],  # mixed
    ],
)
def test_seek_matches_scan(fixture_video, indices):
    scan = OpenCVVideoSource(fixture_video, seek="never")
    seek = OpenCVVideoSource(fixture_video, seek="always")
    a = scan.get_frames(np.asarray(indices))
    b = seek.get_frames(np.asarray(indices))
    np.testing.assert_array_equal(a, b)


def test_seek_backward_then_forward(fixture_video):
    seek = OpenCVVideoSource(fixture_video, seek="always")
    scan = OpenCVVideoSource(fixture_video, seek="never")
    first = [200, 250]
    second = [20, 120]  # before the capture position: reopen + seek
    for req in (first, second):
        np.testing.assert_array_equal(
            seek.get_frames(np.asarray(req)), scan.get_frames(np.asarray(req))
        )


def test_auto_seek_gates_on_metadata(fixture_video):
    src = OpenCVVideoSource(fixture_video, seek="auto")
    assert src._meta_count_ok  # cv2-written mp4 reports a frame count
    assert src._seek_allowed()
    src2 = OpenCVVideoSource(fixture_video, seek="never")
    assert not src2._seek_allowed()


def test_native_runtime_seek_matches_python_scan(fixture_video):
    """The C++ runtime mirrors the seek policy (kvq_runtime.cpp
    kSeekMinSkip); its frames must match the Python scan path exactly."""
    from kvq_tpu import runtime

    if not runtime.ensure_built():
        pytest.skip("native runtime unavailable")
    native = runtime.NativeVideoSource(fixture_video, None)
    scan = OpenCVVideoSource(fixture_video, seek="never")
    for req in ([5, 100, 180, 290], list(range(150, 182))):
        np.testing.assert_array_equal(
            native.get_frames(np.asarray(req)),
            scan.get_frames(np.asarray(req)),
        )


def test_seek_past_eof_falls_back_to_scan(fixture_video):
    """Overcounting containers (VFR mp4 headers estimate duration*fps)
    can send a seek past true EOF; the source must fall back to pure
    scanning and clamp to the real last frame exactly like the scan
    path — not corrupt _n_raw to the seek target and raise (r5
    self-review finding).  Simulated by inflating the frame count on a
    real container."""
    seek = OpenCVVideoSource(fixture_video, seek="always")
    scan = OpenCVVideoSource(fixture_video, seek="never")
    # pretend the header overcounted: 300 real frames reported as 400
    seek._n_raw = scan._n_raw = 400
    req = np.asarray([10, 380])  # deep request -> seek jumps past EOF
    out_scan = scan.get_frames(req)
    out_seek = seek.get_frames(req)
    np.testing.assert_array_equal(out_seek, out_scan)
    # both recovered the true length and clamp index 380 to the last
    # real frame
    assert seek._n_raw == scan._n_raw == 300
    assert seek._seek == "never"  # seeking disabled after the fallback
