import numpy as np
import pytest

from kvq_tpu.data.fragments import fragment_index_maps, get_spatial_fragments


def _reference_mosaic(video_thwc, Fh, Fw, fh, fw, aligned, rnd_h, rnd_w):
    """Direct port of the reference's triple loop
    (fusion_datasets.py:103-117) as the golden model, on (T,H,W,C)."""
    T, H, W, C = video_thwc.shape
    hgrids = [min(H // Fh * i, H - fh) for i in range(Fh)]
    wgrids = [min(W // Fw * i, W - fw) for i in range(Fw)]
    out = np.zeros((T, Fh * fh, Fw * fw, C), dtype=video_thwc.dtype)
    for i, hs in enumerate(hgrids):
        for j, ws in enumerate(wgrids):
            for t in range(T // aligned):
                t_s, t_e = t * aligned, (t + 1) * aligned
                h_s, h_e = i * fh, (i + 1) * fh
                w_s, w_e = j * fw, (j + 1) * fw
                h_so = hs + rnd_h[i, j, t]
                w_so = ws + rnd_w[i, j, t]
                out[t_s:t_e, h_s:h_e, w_s:w_e] = video_thwc[
                    t_s:t_e, h_so : h_so + fh, w_so : w_so + fw
                ]
    return out


def test_mosaic_matches_reference_loop():
    rng = np.random.default_rng(0)
    T, H, W = 8, 270, 480
    Fh = Fw = 9
    fh = fw = 16
    aligned = 4
    video = rng.integers(0, 256, size=(T, H, W, 3), dtype=np.uint8)
    tg = T // aligned
    rnd_h = rng.integers(0, H // Fh - fh, size=(Fh, Fw, tg))
    rnd_w = rng.integers(0, W // Fw - fw, size=(Fh, Fw, tg))
    got = get_spatial_fragments(
        video, Fh, Fw, fh, fw, aligned, rnd_h=rnd_h, rnd_w=rnd_w
    )
    expected = _reference_mosaic(video, Fh, Fw, fh, fw, aligned, rnd_h, rnd_w)
    np.testing.assert_array_equal(got, expected)


def test_mosaic_ksvqe_shape():
    # KVQ config: 9x9 grid of 32px from clip 32x540x960, aligned=8
    video = np.zeros((32, 540, 960, 3), dtype=np.uint8)
    out = get_spatial_fragments(video, 9, 9, 32, 32, aligned=8,
                                rng=np.random.default_rng(0))
    assert out.shape == (32, 288, 288, 3)


def test_zero_jitter_when_cells_too_small():
    # grid cell smaller than fragment => offsets must be zero
    video = np.arange(2 * 36 * 36 * 1, dtype=np.float32).reshape(2, 36, 36, 1)
    out = get_spatial_fragments(video, 9, 9, 4, 4, aligned=1,
                                rng=np.random.default_rng(0))
    # H//9=4 == fsize 4 => no jitter; mosaic is exact grid copy
    np.testing.assert_array_equal(out, video)


def test_single_frame_uses_aligned_1():
    video = np.random.default_rng(0).integers(
        0, 255, size=(1, 100, 100, 3), dtype=np.uint8
    )
    out = get_spatial_fragments(video, 7, 7, 8, 8, aligned=32,
                                rng=np.random.default_rng(1))
    assert out.shape == (1, 56, 56, 3)


def test_upsample_fallback_when_video_small():
    video = np.random.default_rng(0).integers(
        0, 255, size=(4, 100, 100, 3), dtype=np.uint8
    )
    out = get_spatial_fragments(video, 9, 9, 32, 32, aligned=4,
                                rng=np.random.default_rng(0))
    assert out.shape == (4, 288, 288, 3)


def test_index_maps_shapes():
    ymap, xmap = fragment_index_maps(540, 960, 32, 9, 9, 32, 32, 8)
    assert ymap.shape == (4, 288, 288)
    assert xmap.shape == (4, 288, 288)
    assert ymap.max() < 540 and xmap.max() < 960


def test_jax_gather_matches_numpy():
    jax = pytest.importorskip("jax")
    from kvq_tpu.data.fragments import get_spatial_fragments_jax

    rng = np.random.default_rng(3)
    video = rng.normal(size=(8, 90, 90, 3)).astype(np.float32)
    ymap, xmap = fragment_index_maps(90, 90, 8, 3, 3, 16, 16, 4,
                                     rng=np.random.default_rng(5))
    tg = np.arange(8) // 4
    expected = video[np.arange(8)[:, None, None], ymap[tg], xmap[tg]]
    got = np.asarray(get_spatial_fragments_jax(video, ymap, xmap, 4))
    np.testing.assert_allclose(got, expected)
