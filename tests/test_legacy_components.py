"""Legacy/auxiliary components: SampleFrames, FragmentSampleFrames,
get_spatial_cropped_fragments, swin_2d_tiny (reference
basic_datasets.py:110-231, fusion_datasets.py:123-226,
swin_backbone.py:1098)."""

import numpy as np

from kvq_tpu.data.fragments import get_spatial_cropped_fragments
from kvq_tpu.data.samplers import FragmentSampleFrames, SampleFrames

import pytest

pytestmark = pytest.mark.slow  # model-assembly/e2e: minutes on small hosts


def test_fragment_sample_frames_matches_unified():
    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    from kvq_tpu.data.samplers import UnifiedFrameSampler

    legacy = FragmentSampleFrames(4, 8, frame_interval=2, num_clips=2, rng=rng1)
    unified = UnifiedFrameSampler(4, 8, 2, 2, rng=rng2)
    np.testing.assert_array_equal(legacy(300), unified(300))


def test_sample_frames_test_mode_deterministic_centered():
    s = SampleFrames(clip_len=8, frame_interval=2, num_clips=3)
    a = s(200, train=False)
    b = s(200, train=False)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (24,)
    # clips are centered: first offset = avg_interval/2
    avg = (200 - 16 + 1) / 3.0
    assert a[0] == int(avg / 2)
    assert (a < 200).all() and (a >= 0).all()


def test_sample_frames_train_mode_within_bounds():
    s = SampleFrames(clip_len=8, frame_interval=2, num_clips=3,
                     rng=np.random.default_rng(0))
    idx = s(100, train=True)
    assert idx.shape == (24,)
    assert (idx >= 0).all() and (idx < 100).all()
    # per-clip strides are frame_interval apart (mod wrap excluded here)
    clip = idx[:8]
    np.testing.assert_array_equal(np.diff(clip), np.full(7, 2))


def test_sample_frames_short_video():
    s = SampleFrames(clip_len=8, frame_interval=2, num_clips=2)
    idx = s(10, train=False)  # shorter than ori_clip_len=16 -> wraps mod 10
    assert idx.shape == (16,)
    assert (idx < 10).all()


def test_cropped_fragments_shape_and_band():
    rng = np.random.default_rng(0)
    v = rng.integers(0, 255, size=(8, 480, 640, 3)).astype(np.uint8)
    out = get_spatial_cropped_fragments(v, aligned=8, rng=rng)
    assert out.shape == (8, 224, 224, 3)
    # content comes only from the centered 2/3-width band
    crop_h = 640 // 3 * 2
    top = 480 // 2 - crop_h // 2
    band = v[:, top : top + crop_h]
    # every output pixel value must exist in the band (cheap necessary check)
    assert np.isin(out[0, :32, :32, 0], band[0, :, :, 0]).all()


def test_cropped_fragments_small_video_upsamples():
    rng = np.random.default_rng(1)
    v = rng.integers(0, 255, size=(4, 120, 160, 3)).astype(np.uint8)
    out = get_spatial_cropped_fragments(v, aligned=4, rng=rng)
    assert out.shape == (4, 224, 224, 3)


def test_swin_2d_tiny_per_frame():
    import jax
    import jax.numpy as jnp

    from kvq_tpu.nn.swin import swin_2d_tiny

    m = swin_2d_tiny(use_checkpoint=False)
    x = {
        "technical": jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 2, 56, 56, 3)),
            jnp.float32,
        )
    }
    vs = m.init(jax.random.key(0), x, train=False)
    y = m.apply(vs, x, train=False)
    # patch 4 -> 14x14 tokens, 3 merges -> 2x2; temporal axis untouched
    assert y.shape == (1, 2, 2, 2, 768)


def test_unused_film_variants_shapes():
    import jax
    import jax.numpy as jnp

    from kvq_tpu.nn import cdm

    r = np.random.default_rng(0)
    x4 = jnp.asarray(r.normal(size=(2, 4, 4, 8)), jnp.float32)
    x5 = jnp.asarray(r.normal(size=(2, 2, 4, 4, 8)), jnp.float32)
    tok5 = jnp.asarray(r.normal(size=(2, 32, 8)), jnp.float32)
    for cls, args, want in [
        (cdm.SemanticFiLM4, (x4, x4), (2, 4, 4, 8)),
        (cdm.SemanticFiLM6, (x4, x4), (2, 4, 4, 8)),
        (cdm.SemanticFiLM8, (x4, x4), (2, 4, 4, 8)),
        (cdm.DistFiLM5, (x5, tok5), (2, 32, 8)),
        (cdm.DistFiLM7, (x5, tok5), (2, 32, 8)),
    ]:
        m = cls()
        vs = m.init(jax.random.key(0), *args)
        y = m.apply(vs, *args)
        assert y.shape == want, cls.__name__
        assert np.isfinite(np.asarray(y)).all()
    # SemanticFiLM6 replicates the reference's dead-code quirk: one shared
    # get_beta layer, no get_gamma params
    m6 = cdm.SemanticFiLM6()
    p6 = m6.init(jax.random.key(0), x4, x4)["params"]
    assert "get_beta" in p6 and "get_gamma" not in p6


def test_predictor_lg():
    import jax
    import jax.numpy as jnp

    from kvq_tpu.nn.regionnet import PredictorLG

    m = PredictorLG()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 10, 16)), jnp.float32
    )
    vs = m.init(jax.random.key(0), x)
    y = m.apply(vs, x)
    assert y.shape == (2, 10, 1)


def test_patchnet_ms_modes_and_layout():
    import jax
    import jax.numpy as jnp

    from kvq_tpu.nn.regionnet import PatchNetMS

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 8, 8, 4)), jnp.float32)
    # time mode: selected frames must be exact copies of input frames
    m = PatchNetMS(k=3, anchor_size=4, mode="time")
    vs = m.init(jax.random.key(0), x, train=False)
    y = np.asarray(m.apply(vs, x, train=False))
    assert y.shape == (2, 3, 8, 8, 4)
    xs = np.asarray(x)
    for b in range(2):
        for kk in range(3):
            assert any(
                np.allclose(y[b, kk], xs[b, t]) for t in range(6)
            ), "time-mode output must be one of the input frames"
    # train mode runs the perturbed estimator
    yt = m.apply(vs, x, train=True, key=jax.random.key(1))
    assert yt.shape == (2, 3, 8, 8, 4)

    # spatial mode: selected patch must be an exact aligned crop
    m2 = PatchNetMS(k=1, anchor_size=4, stride=2, mode="spatial")
    vs2 = m2.init(jax.random.key(0), x, train=False)
    y2 = np.asarray(m2.apply(vs2, x, train=False))
    assert y2.shape == (2, 6, 4, 4, 4)
    crops = [
        xs[b, t, i : i + 4, j : j + 4]
        for b in range(2)
        for t in range(6)
        for i in (0, 2, 4)
        for j in (0, 2, 4)
    ]
    for b in range(2):
        for t in range(6):
            assert any(np.allclose(y2[b, t], c) for c in crops), (
                "spatial-mode output must be an aligned crop of the frame"
            )


def test_convnext_2d_factories():
    import jax
    import jax.numpy as jnp

    from kvq_tpu.nn.convnext import convnext_pico, convnextv2_atto

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32
    )
    for factory, c_out in ((convnextv2_atto, 320), (convnext_pico, 512)):
        m = factory()
        vs = m.init(jax.random.key(0), x, train=False)
        y = m.apply(vs, x, train=False)
        assert y.shape == (2, 1, 1, c_out)
        # V2 factories carry GRN params, V1 carry layer-scale gamma
        leaves = jax.tree_util.tree_leaves(vs["params"])
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_patchnet_ms_conv_blends_two_scales():
    import jax
    import jax.numpy as jnp

    from kvq_tpu.nn.regionnet import PatchNetMSConv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 8, 8, 6)), jnp.float32)
    m = PatchNetMSConv()
    vs = m.init(jax.random.key(0), x)
    y = np.asarray(m.apply(vs, x))
    assert y.shape == (2, 3, 8, 8, 3)
    # per-pixel softmax weights -> output bounded by the two scales' envelope
    xs = np.asarray(x)
    lo = np.minimum(xs[..., :3], xs[..., 3:])
    hi = np.maximum(xs[..., :3], xs[..., 3:])
    assert (y >= lo - 1e-5).all() and (y <= hi + 1e-5).all()


def test_region_selector_multinomial():
    import jax
    import jax.numpy as jnp

    from kvq_tpu.nn.regionnet import RegionSelector, keyframe_schedule

    rng = np.random.default_rng(0)
    frag = jnp.asarray(rng.normal(size=(1, 8, 24, 24, 3)), jnp.float32)
    cls_attn = jnp.asarray(rng.uniform(size=(1, 4, 9)), jnp.float32)
    _, group = keyframe_schedule(8)
    sel = RegionSelector(k=4, anchor_size=8, sample_type="multinomial")
    out = sel(frag, cls_attn, group, train=True, key=jax.random.key(0))
    # 3x3 anchor grid, k_side=2 -> 16x16 regions
    assert out.shape == (1, 8, 16, 16, 3)
    # one-hot indicator => the output is an exact region crop
    outs = np.asarray(out)
    fr = np.asarray(frag)
    crops = [
        fr[0, t, i : i + 16, j : j + 16]
        for t in range(8)
        for i in (0, 8)
        for j in (0, 8)
    ]
    for t in range(8):
        assert any(np.allclose(outs[0, t], c) for c in crops)


def test_get_adaptive_window_size():
    from kvq_tpu.nn.swin import get_adaptive_window_size

    # reference swin_backbone.py:53-61: window scales with input/base ratio
    assert get_adaptive_window_size((8, 7, 7), (32, 112, 112), (32, 56, 56)) == (
        8,
        14,
        14,
    )
    assert get_adaptive_window_size((8, 7, 7), (16, 56, 56), (32, 56, 56)) == (
        4,
        7,
        7,
    )
