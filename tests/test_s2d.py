"""s2d-packed fragment path: bitwise equivalence with the standard path.

The packed layout (data/fragments.py:s2d_pack) moves the patch-embed
space-to-depth onto the host; QRS selection is applied per temporal-pair
channel half (nn/ksvqe.py:_select_and_embed_packed).  Every device op sees
the same values in the same contraction order, so outputs must be exactly
equal, not merely close.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvq_tpu.data.fragments import s2d_pack, s2d_unpack
from kvq_tpu.nn.ksvqe import KSVQE

from test_ksvqe import TINY, tiny_batch

pytestmark = pytest.mark.slow


def test_pack_roundtrip_exact():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(8, 40, 40, 3)).astype(np.float32)
    p = s2d_pack(v)
    assert p.shape == (4, 10, 10, 96)
    assert np.array_equal(s2d_unpack(p), v)


def _packed_batch(batch):
    frag = np.asarray(batch["fragment"])
    packed = np.stack([s2d_pack(f) for f in frag])
    return dict(batch, fragment=jnp.asarray(packed))


@pytest.mark.parametrize("train", [False, True])
def test_ksvqe_s2d_matches_standard(train):
    model_std = KSVQE(config=TINY, dtype=jnp.float32)
    cfg_s2d = dataclasses.replace(TINY, s2d_input=True)
    model_s2d = KSVQE(config=cfg_s2d, dtype=jnp.float32)

    batch = tiny_batch(B=2, T=8, rng_seed=11)
    variables = model_std.init(
        {"params": jax.random.key(0), "qrs": jax.random.key(1)},
        batch,
        train=False,
    )
    rngs = (
        {"qrs": jax.random.key(7), "dropout": jax.random.key(8)}
        if train
        else {}
    )
    feat_a, dis_a = model_std.apply(
        variables, batch, train=train, rngs=rngs
    )
    feat_b, dis_b = model_s2d.apply(
        variables, _packed_batch(batch), train=train, rngs=rngs
    )
    assert np.array_equal(np.asarray(feat_a), np.asarray(feat_b))
    assert np.array_equal(np.asarray(dis_a), np.asarray(dis_b))
