"""SlowFast-R50 motion-feature backbone (reference SlowFast_features.py).

Regression for a bug where _Pathway created submodules inside plain
methods (flax AssignSubModuleError) — the module could never be
initialized, so the whole slowfast-features pipeline was broken.
"""

import numpy as np

from kvq_tpu.nn.slowfast import SlowFastR50, pack_pathways


def test_pack_pathways_slow_is_every_4th_frame():
    frames = np.arange(32)[None, :, None, None, None] * np.ones(
        (1, 32, 2, 2, 3), np.float32
    )
    slow, fast = pack_pathways(frames)
    assert fast.shape == (1, 32, 2, 2, 3)
    assert slow.shape == (1, 8, 2, 2, 3)
    # linspace(0, 31, 8) indices (reference SlowFast_features.py:126-131)
    np.testing.assert_array_equal(
        slow[0, :, 0, 0, 0], np.linspace(0, 31, 8).astype(np.int64)
    )


def test_slowfast_tiny_forward():
    import jax
    import jax.numpy as jnp

    m = SlowFastR50(layers=(1, 1, 1, 1))
    frames = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 8, 16, 16, 3)), jnp.float32
    )
    slow, fast = pack_pathways(frames)
    vs = m.init(jax.random.key(0), slow, fast)
    sf, ff = m.apply(vs, slow, fast)
    # pooled feature dims are architecture constants (2048 slow / 256 fast)
    assert sf.shape == (1, 2048) and ff.shape == (1, 256)
    assert np.isfinite(np.asarray(sf)).all() and np.isfinite(np.asarray(ff)).all()
    # pathway/lateral structure present under the expected names
    p = vs["params"]
    assert "slow" in p and "fast" in p and "lateral_0_conv" in p
    assert "res2_0" in p["slow"] and "stem_conv" in p["fast"]
