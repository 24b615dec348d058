import numpy as np

from kvq_tpu.data.samplers import UnifiedFrameSampler, make_sampler


def _reference_indices(num_frames, fsize_t, fragments_t, interval, rnd_t):
    """Reimplementation of the reference index math
    (fusion_datasets.py:625-649) for golden comparison."""
    tgrids = np.array(
        [num_frames // fragments_t * i for i in range(fragments_t)], dtype=np.int32
    )
    ranges_t = (
        np.arange(fsize_t)[None, :] * interval + rnd_t[:, None] + tgrids[:, None]
    )
    return ranges_t.reshape(-1)


def test_ksvqe_train_sampler_shape():
    # KSVQE train: clip_len=32, interval=4, num_clips=1, no t_frag
    # => UnifiedFrameSampler(32, num_clips=1, 4) per reference
    # fusion_datasets.py:1002-1004 (fragments_t takes num_clips' position).
    s = make_sampler(
        dict(clip_len=32, frame_interval=4, num_clips=1),
        rng=np.random.default_rng(0),
    )
    inds = s(300)
    assert inds.shape == (32,)
    assert inds.dtype == np.int32
    assert (inds >= 0).all() and (inds < 300).all()
    # strides of 4 inside the clip
    assert ((np.diff(inds) == 4) | (np.diff(inds) < 0)).all()


def test_ksvqe_eval_sampler_96_frames():
    # eval num_clips=3 => fragments_t=3 grids of 32 frames = 96 indices
    s = make_sampler(
        dict(clip_len=32, frame_interval=4, num_clips=3),
        rng=np.random.default_rng(0),
    )
    inds = s(400)
    assert inds.shape == (96,)
    # each 32-chunk lies in its own third of the timeline
    tlength = 400 // 3
    for c in range(3):
        chunk = inds[c * 32 : (c + 1) * 32]
        assert (chunk >= c * tlength).all()
        assert (chunk < c * tlength + tlength).all()


def test_simplevqa_sampler_8_grids():
    # t_frag=8, clip_len=8 => 8 grids x 1 frame
    s = make_sampler(
        dict(clip_len=8, frame_interval=10, num_clips=1, t_frag=8),
        rng=np.random.default_rng(0),
    )
    inds = s(240)
    assert inds.shape == (8,)
    tlength = 240 // 8
    for i, idx in enumerate(inds):
        assert i * tlength <= idx < (i + 1) * tlength


def test_golden_index_math_with_fixed_offsets():
    fsize_t, fragments_t, interval = 4, 3, 2
    num_frames = 60
    # force known offsets by rigging the rng
    class FixedRng:
        def integers(self, lo, hi, size):
            return np.array([1, 2, 3])[: size if isinstance(size, int) else size[0]]

    s = UnifiedFrameSampler(fsize_t, fragments_t, interval, rng=FixedRng())
    got = s.get_frame_indices(num_frames)
    expected = _reference_indices(
        num_frames, fsize_t, fragments_t, interval, np.array([1, 2, 3])
    )
    np.testing.assert_array_equal(got, expected)


def test_short_video_zero_offsets_and_mod():
    # tlength <= fsize_t*interval => offsets all zero; indices wrap via mod
    s = UnifiedFrameSampler(32, 1, 4, rng=np.random.default_rng(0))
    inds = s(50)  # 32*4=128 > 50 => zero offset, arange(32)*4 mod 50
    expected = np.mod(np.arange(32) * 4, 50)
    np.testing.assert_array_equal(inds, expected)


def test_num_clips_concatenation():
    s = UnifiedFrameSampler(4, 2, 1, num_clips=3, rng=np.random.default_rng(0))
    inds = s(100)
    assert inds.shape == (3 * 2 * 4,)
