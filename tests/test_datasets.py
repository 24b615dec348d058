import numpy as np

from kvq_tpu.core.registry import DATASETS
from kvq_tpu.data.datasets import (
    KVQDataset,
    SimpleVQADataset,
    make_synthetic_opt,
)

KSVQE_SAMPLE_TYPES = {
    "technical": dict(
        fragments_h=9, fragments_w=9, fsize_h=32, fsize_w=32,
        size_h=112, size_w=112, aligned=8,
        clip_len=32, frame_interval=4, num_clips=1,
    )
}

SIMPLEVQA_SAMPLE_TYPES = {
    "simpleVQA": dict(
        resize=520, crop=448, clip_len=8, frame_interval=10,
        t_frag=8, num_clips=1,
    )
}


def test_registry_has_reference_names():
    for name in (
        "ViewDecompositionDataset_KVQ",
        "ViewDecompositionDataset_add_forSimpleVQA",
        "ViewDecompositionDataset",
    ):
        assert name in DATASETS


def test_kvq_dataset_contract():
    opt = make_synthetic_opt(
        n_videos=2, n_frames=140, height=360, width=640,
        sample_types=KSVQE_SAMPLE_TYPES, phase="train",
    )
    # ori_fragment is opt-in (dead in the reference; costs a second mosaic)
    opt["return_ori_fragment"] = True
    ds = KVQDataset(opt)
    assert len(ds) == 2
    item = ds[0]
    # fragment: (T,288,288,3) imagenet_255-normalized
    assert item["fragment"].shape == (32, 288, 288, 3)
    assert item["fragment"].dtype == np.float32
    assert abs(item["fragment"].mean()) < 3  # normalized scale
    # resize view: (T,112,112,3) CLIP-normalized
    assert item["resize_video"].shape == (32, 112, 112, 3)
    assert item["ori_fragment"].shape == (32, 288, 288, 3)
    assert isinstance(item["dis_label"], int)
    assert isinstance(item["label"], float)
    assert item["num_clips"]["technical"] == 1
    assert item["clip_len"]["technical"] == 32


def test_kvq_dataset_ori_fragment_default_off():
    """By default the dead-in-reference ``ori_fragment`` view is skipped
    (it doubles per-sample mosaic cost); the batch otherwise matches."""
    opt = make_synthetic_opt(
        n_videos=1, n_frames=140, height=360, width=640,
        sample_types=KSVQE_SAMPLE_TYPES, phase="train",
    )
    item = KVQDataset(opt)[0]
    assert "ori_fragment" not in item
    assert item["fragment"].shape == (32, 288, 288, 3)


def test_kvq_eval_num_clips_3_gives_96_frames():
    st = {k: dict(v, num_clips=3) for k, v in KSVQE_SAMPLE_TYPES.items()}
    opt = make_synthetic_opt(
        n_videos=1, n_frames=400, height=360, width=640,
        sample_types=st, phase="test",
    )
    item = KVQDataset(opt)[0]
    # SURVEY §5.1.3: eval feeds num_clips*clip_len=96 frames as one clip
    assert item["fragment"].shape == (96, 288, 288, 3)


def test_kvq_dataset_deterministic_per_index():
    opt = make_synthetic_opt(
        n_videos=1, n_frames=140, height=360, width=640,
        sample_types=KSVQE_SAMPLE_TYPES, phase="train", seed=7,
    )
    a = KVQDataset(opt)[0]
    b = KVQDataset(opt)[0]
    np.testing.assert_array_equal(a["fragment"], b["fragment"])
    # different epoch => different sampling
    c = KVQDataset(opt).__getitem__(0, epoch=1)
    assert not np.array_equal(a["fragment"], c["fragment"])


def test_simplevqa_dataset_contract():
    opt = make_synthetic_opt(
        n_videos=2, n_frames=240, height=540, width=960,
        sample_types=SIMPLEVQA_SAMPLE_TYPES, phase="train", with_features=True,
    )
    ds = SimpleVQADataset(opt)
    item = ds[0]
    assert item["simpleVQA"].shape == (8, 448, 448, 3)
    assert item["feat"].shape == (8, 2304)
    # the reference's no-/255 quirk => large dynamic range survives
    assert item["simpleVQA"].max() > 10


def test_simplevqa_eval_center_crop_deterministic():
    opt = make_synthetic_opt(
        n_videos=1, n_frames=240, height=540, width=960,
        sample_types=SIMPLEVQA_SAMPLE_TYPES, phase="test", with_features=True,
    )
    a = SimpleVQADataset(opt)[0]
    b = SimpleVQADataset(opt)[0]
    np.testing.assert_array_equal(a["simpleVQA"], b["simpleVQA"])
