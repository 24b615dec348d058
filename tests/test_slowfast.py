"""SlowFast-R50 motion-feature backbone (reference SlowFast_features.py).

Regression for a bug where _Pathway created submodules inside plain
methods (flax AssignSubModuleError) — the module could never be
initialized, so the whole slowfast-features pipeline was broken.
"""

import numpy as np

from kvq_tpu.nn.slowfast import SlowFastR50, pack_pathways

import pytest

pytestmark = pytest.mark.slow  # model-assembly/e2e: minutes on small hosts


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


def test_slowfast_converter_covers_every_param():
    """Synthesize a pytorchvideo-named state dict for the tiny model and
    require the converter to produce every flax leaf with the right
    shape (keys follow pytorchvideo create_slowfast naming)."""
    import jax
    import jax.numpy as jnp

    from kvq_tpu.core import torch_import as TI

    layers = (1, 1, 1, 1)
    m = SlowFastR50(layers=layers)
    frames = jnp.zeros((1, 8, 16, 16, 3), jnp.float32)
    slow, fast = pack_pathways(frames)
    vs = m.init(jax.random.key(0), slow, fast)

    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                out.update(flatten(v, path))
            else:
                out[path] = np.asarray(v)
        return out

    flat = {**flatten(vs["params"]), **flatten(vs["batch_stats"])}

    rng = np.random.default_rng(0)
    sd = {}
    for path, arr in flat.items():
        parts = path.split("/")
        leaf = parts[-1]
        if parts[0] in ("slow", "fast"):
            pi = 0 if parts[0] == "slow" else 1
            mod = parts[1]
            if mod == "stem_conv":
                key = f"blocks.0.multipathway_blocks.{pi}.conv.weight"
                sd[key] = rng.normal(size=arr.shape).astype(np.float32).transpose(4, 3, 0, 1, 2)
                continue
            if mod == "stem_bn":
                base = f"blocks.0.multipathway_blocks.{pi}.norm"
            else:  # res{li+2}_{b}
                li = int(mod[3]) - 2
                b = int(mod.split("_")[1])
                src = f"blocks.{li + 1}.multipathway_blocks.{pi}.res_blocks.{b}"
                sub = parts[2]
                conv_map = {"conv1": "conv_a", "conv2": "conv_b", "conv3": "conv_c",
                            "downsample_conv": None}
                bn_map = {"bn1": "norm_a", "bn2": "norm_b", "bn3": "norm_c",
                          "downsample_bn": None}
                if sub in conv_map:
                    tk = (f"{src}.branch1_conv.weight" if sub == "downsample_conv"
                          else f"{src}.branch2.{conv_map[sub]}.weight")
                    sd[tk] = rng.normal(size=arr.shape).astype(np.float32).transpose(4, 3, 0, 1, 2)
                    continue
                base = (f"{src}.branch1_norm" if sub == "downsample_bn"
                        else f"{src}.branch2.{bn_map[sub]}")
        elif parts[0].startswith("lateral_"):
            i = int(parts[0].split("_")[1])
            src = f"blocks.{i}.multipathway_fusion"
            if parts[0].endswith("_conv"):
                sd[f"{src}.conv_fast_to_slow.weight"] = rng.normal(
                    size=arr.shape
                ).astype(np.float32).transpose(4, 3, 0, 1, 2)
                continue
            base = f"{src}.norm"
        else:
            raise AssertionError(f"unmapped path {path}")
        suffix = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                  "var": "running_var"}[leaf]
        sd[f"{base}.{suffix}"] = rng.normal(size=arr.shape).astype(np.float32)

    p, s = TI.convert_slowfast_r50(sd, layers=layers)
    got = {**flatten(p), **flatten(s)}
    missing = sorted(set(flat) - set(got))
    assert not missing, f"converter missed: {missing[:8]}"
    for k, v in flat.items():
        assert got[k].shape == v.shape, (k, got[k].shape, v.shape)
