"""Legacy DOVER/FastVQA dataset classes (reference basic_datasets.py —
dead code there; working equivalents here)."""

import numpy as np
import pytest

from kvq_tpu.core.registry import DATASETS
from kvq_tpu.data.decode import SyntheticVideoSource
from kvq_tpu.data.legacy_datasets import (
    CroppedImageDataset,
    CroppedVideoDataset,
    FastVQAPlusPlusDataset,
    FragmentImageDataset,
    FragmentVideoDataset,
    ResizedImageDataset,
    ResizedVideoDataset,
)

ANN = [dict(filename=f"v{i}.mp4", label=float(i)) for i in range(2)]


def _src(path):
    return SyntheticVideoSource(300, 360, 640, seed=abs(hash(path)) % 1000)


def test_registry_has_legacy_names():
    for name in (
        "FastVQAPlusPlusDataset",
        "FragmentVideoDataset",
        "ResizedVideoDataset",
        "CroppedVideoDataset",
        "FragmentImageDataset",
        "ResizedImageDataset",
        "CroppedImageDataset",
    ):
        assert name in DATASETS


def test_fragment_video_dataset():
    ds = FragmentVideoDataset(
        ANN, "", clip_len=32, num_clips=2, fragments=7, fsize=32,
        source_factory=_src,
    )
    assert len(ds) == 2
    item = ds[0]
    # V=2 clips of 32 frames, 7x7x32 mosaic, channels-last, normalized
    assert item["video"].shape == (2, 32, 224, 224, 3)
    assert item["video"].dtype == np.float32
    assert abs(item["video"].mean()) < 3
    assert item["gt_label"] == 0.0
    assert item["frame_inds"].shape == (64,)


def test_fragment_video_dataset_nfrags_and_cache():
    ds = FragmentVideoDataset(
        ANN, "", clip_len=32, num_clips=1, nfrags=2, source_factory=_src,
        cache_in_memory=True,
    )
    item = ds[1]
    assert item["video"].shape == (2, 32, 224, 224, 3)
    again = ds[1]
    np.testing.assert_array_equal(item["video"], again["video"])


def test_fastvqa_plusplus_dataset():
    ds = FastVQAPlusPlusDataset(
        ANN, "", fragments=(8, 8, 8), fsize=(4, 32, 32), num_clips=1,
        source_factory=_src,
    )
    item = ds[0]
    # clip_len = 8*4 = 32 frames, 8x8 grid of 32px -> 256x256
    assert item["video"].shape == (1, 32, 256, 256, 3)


def test_resized_and_cropped_video_datasets():
    ds = ResizedVideoDataset(
        ANN, "", clip_len=16, num_clips=2, size=128, source_factory=_src
    )
    assert ds[0]["video"].shape == (2, 16, 128, 128, 3)

    dc = CroppedVideoDataset(
        ANN, "", clip_len=16, num_clips=1, size=224, ncrops=2,
        source_factory=_src,
    )
    assert dc[0]["video"].shape == (2, 16, 224, 224, 3)


IMG_ANN = [dict(filename=f"i{i}.png", label=float(i)) for i in range(2)]


def _img_reader(path):
    rng = np.random.default_rng(abs(hash(path)) % 1000)
    return rng.integers(0, 255, size=(360, 640, 3)).astype(np.uint8)


def test_fragment_image_dataset():
    ds = FragmentImageDataset(
        IMG_ANN, "", fragments=7, fsize=32, image_reader=_img_reader
    )
    item = ds[0]
    assert item["image"].shape == (224, 224, 3)
    assert item["image"].dtype == np.float32
    assert item["original_shape"] == (360, 640)

    # nfrags > 1 keeps a leading crop axis
    ds2 = FragmentImageDataset(
        IMG_ANN, "", fragments=7, fsize=32, nfrags=3, image_reader=_img_reader
    )
    assert ds2[0]["image"].shape == (3, 224, 224, 3)


def test_resized_and_cropped_image_datasets():
    ds = ResizedImageDataset(IMG_ANN, "", size=96, image_reader=_img_reader)
    assert ds[0]["image"].shape == (96, 96, 3)

    dc = CroppedImageDataset(IMG_ANN, "", size=64, image_reader=_img_reader)
    assert dc[0]["image"].shape == (64, 64, 3)


def test_decode_views_ms():
    from kvq_tpu.data.decode import decode_views_ms
    from kvq_tpu.data.samplers import UnifiedFrameSampler

    src = SyntheticVideoSource(200, 360, 640, seed=0)
    rng = np.random.default_rng(0)
    sampler = UnifiedFrameSampler(32, 1, frame_interval=2, num_clips=1, rng=rng)
    st = {"technical": dict(fragments_h=7, fragments_w=7, fsize_h=32,
                            fsize_w=32, aligned=8)}
    sampled, frame_inds = decode_views_ms(
        src, st, {"technical": sampler}, rng=rng
    )
    assert sampled["technical"]["scale1"].shape == (32, 224, 224, 3)
    # scale2 forces 64px cells -> 7*64 = 448 mosaic
    assert sampled["technical"]["scale2"].shape == (32, 448, 448, 3)
    assert sampled["technical"]["res"] == 360
    assert frame_inds["technical"].shape == (32,)


def test_legacy_registry_opt_dict_construction():
    # Trainer.build_datasets calls DATASETS.get(type)(args_dict) — the
    # legacy registrations must accept the opt-dict convention
    ds = DATASETS.get("FragmentVideoDataset")(
        dict(
            anno_file=ANN,
            data_prefix="",
            clip_len=32,
            num_clips=1,
            source_factory=_src,
            weight=0.5,  # unknown keys are dropped
        )
    )
    assert len(ds) == 2
    assert ds[0]["video"].shape == (1, 32, 224, 224, 3)


def test_fastvqa_plusplus_asymmetric_and_short_clip():
    # fragments/fsize index-2 (W axis) honored; aligned clamps to clip_len
    ds = FastVQAPlusPlusDataset(
        ANN, "", fragments=(4, 8, 4), fsize=(4, 32, 64), source_factory=_src,
    )
    item = ds[0]
    # clip_len = 4*4 = 16 (< default aligned=32 — must not raise);
    # 8x32=256 tall, 4x64=256 wide
    assert item["video"].shape == (1, 16, 256, 256, 3)


def test_legacy_train_sampling_reproducible_per_index():
    ds = FragmentVideoDataset(
        ANN, "", clip_len=16, num_clips=1, phase="train", source_factory=_src,
    )
    a = ds[0]["video"]
    b = ds[0]["video"]
    np.testing.assert_array_equal(a, b)
