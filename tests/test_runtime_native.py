"""Native C++ runtime vs numpy-path equivalence.

Auto-builds libkvq_runtime.so via runtime.ensure_built(); skips only when
the toolchain/OpenCV headers are genuinely unavailable.
"""

import numpy as np
import pytest

runtime = pytest.importorskip("kvq_tpu.runtime")
if not runtime.ensure_built():
    pytest.skip(
        "libkvq_runtime.so could not be built (no g++/OpenCV?)",
        allow_module_level=True,
    )

from kvq_tpu.data import views as V
from kvq_tpu.data.fragments import fragment_index_maps


def test_native_mosaic_matches_numpy():
    rng = np.random.default_rng(0)
    T, H, W = 8, 270, 480
    video = rng.integers(0, 256, size=(T, H, W, 3), dtype=np.uint8)
    ymap, xmap = fragment_index_maps(
        H, W, T, 9, 9, 16, 16, 4, rng=np.random.default_rng(1)
    )
    native = runtime.fragment_mosaic_normalize(
        video, ymap, xmap, 4, V.IMAGENET_255_MEAN, V.IMAGENET_255_STD
    )
    tg = np.arange(T) // 4
    gathered = video[np.arange(T)[:, None, None], ymap[tg], xmap[tg]]
    expected = V.normalize(gathered, "imagenet_255")
    np.testing.assert_allclose(native, expected, atol=1e-5)


def test_native_resize_matches_cv2_path():
    rng = np.random.default_rng(2)
    video = rng.integers(0, 256, size=(4, 360, 640, 3), dtype=np.uint8)
    native = runtime.resize_normalize(
        video, 112, 112, V.CLIP_MEAN, V.CLIP_STD, div255=True
    )
    expected = V.normalize(V.get_resized_video(video, 112, 112), "clip")
    # both use cv2 INTER_AREA; float rounding only
    np.testing.assert_allclose(native, expected, atol=1e-5)


def test_native_video_source_roundtrip(tmp_path):
    import cv2

    path = str(tmp_path / "t.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for i in range(40):
        w.write(np.full((48, 64, 3), i * 5 % 255, np.uint8))
    w.release()

    src = runtime.NativeVideoSource(path, pad_short=130)
    assert src.num_frames() == 131  # pad-repeat semantics
    frames = src.get_frames(np.array([0, 5, 200]))
    assert frames.shape == (3, 48, 64, 3)
    # padded index clamps to last decoded frame
    assert (frames[2] == frames[2][0, 0]).all()

    from kvq_tpu.data.decode import OpenCVVideoSource

    ref = OpenCVVideoSource(path, pad_short=130)
    np.testing.assert_array_equal(
        src.get_frames(np.array([3, 7])), ref.get_frames(np.array([3, 7]))
    )


def test_dataset_uses_native_path(tmp_path):
    """KVQDataset on a real mp4 exercises the fused native views."""
    import cv2

    from kvq_tpu.data.datasets import KVQDataset

    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (640, 360))
    for i in range(140):
        frame = np.full((360, 640, 3), (i * 3) % 255, np.uint8)
        cv2.circle(frame, (320, 180), 50, (255, 0, 0), -1)
        w.write(frame)
    w.release()

    st = {"technical": dict(fragments_h=9, fragments_w=9, fsize_h=32,
                            fsize_w=32, size_h=112, size_w=112, aligned=8,
                            clip_len=32, frame_interval=4, num_clips=1)}
    ds = KVQDataset({
        "anno_file": [dict(filename=path, label=3.0, cls_label=0,
                           dis_label=1, video_name="v.mp4")],
        "data_prefix": "", "phase": "test", "sample_types": st,
    })
    item = ds[0]
    assert item["fragment"].shape == (32, 288, 288, 3)
    assert item["resize_video"].shape == (32, 112, 112, 3)
    assert np.isfinite(item["fragment"]).all()
