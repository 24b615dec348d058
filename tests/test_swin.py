import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvq_tpu.nn import swin as S

pytestmark = pytest.mark.slow  # model-assembly/e2e: minutes on small hosts


def test_get_window_size_clamps():
    assert S.get_window_size((2, 14, 14), (8, 7, 7)) == (2, 7, 7)
    w, s = S.get_window_size((2, 14, 14), (8, 7, 7), (4, 3, 3))
    assert w == (2, 7, 7)
    assert s == (0, 3, 3)  # shift zeroed where clamped


def test_relative_position_index_range():
    rpi = S.relative_position_index((2, 7, 7))
    n = 2 * 7 * 7
    table = (2 * 2 - 1) * (2 * 7 - 1) * (2 * 7 - 1)
    assert rpi.shape == (n, n)
    assert rpi.min() >= 0 and rpi.max() < table
    # self-pairs all map to the same central index
    assert len(np.unique(np.diag(rpi))) == 1


def test_shift_mask_structure():
    mask = S.compute_shift_mask((4, 14, 14), (2, 7, 7), (1, 3, 3))
    nW = (4 // 2) * (14 // 7) * (14 // 7)
    assert mask.shape == (nW, 2 * 7 * 7, 2 * 7 * 7)
    assert set(np.unique(mask)) <= {0.0, -100.0}
    # unshifted => None
    assert S.compute_shift_mask((4, 14, 14), (2, 7, 7), (0, 0, 0)) is None


def test_fragment_gate_zero_within_fragment():
    # token volume exactly = fragment grid upsampled: each 7x7 window is one
    # fragment when dims == fragments*window
    g = S.fragment_gate((1, 49, 49), (1, 7, 7), (1, 7, 7), (0, 0, 0))
    assert g.shape == (49, 49, 49)
    np.testing.assert_array_equal(g, 0)  # every window inside one fragment
    # coarser: windows span fragments => nonzero gates
    g2 = S.fragment_gate((1, 14, 14), (1, 7, 7), (1, 7, 7), (0, 0, 0))
    assert (g2 > 0).any()


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 14, 14, 8)))
    win = S.window_partition(x, (2, 7, 7))
    assert win.shape == (2, 2 * 2 * 2, 2 * 7 * 7, 8)
    back = S.window_reverse(win.reshape(-1, *win.shape[2:]).reshape(win.shape),
                            (2, 7, 7), 2, 4, 14, 14)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


@pytest.fixture(scope="module")
def tiny_swin():
    cfg = S.SwinConfig(
        embed_dim=24,
        depths=(1, 1),
        num_heads=(2, 2),
        window_size=(2, 7, 7),
        frag_biases=(True, False),
        jump_attention=(False, False),
        use_checkpoint=False,
        drop_path_rate=0.1,
    )
    model = S.SwinTransformer3D(config=cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 4, 28, 28, 3))
    variables = model.init(jax.random.key(0), {"technical": x}, train=False)
    return model, variables


def test_swin_forward_shape(tiny_swin):
    model, variables = tiny_swin
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4, 28, 28, 3)), jnp.float32
    )
    out = model.apply(variables, {"technical": x}, train=False)
    # patch (2,4,4): T 4->2, HW 56->14; one merge: 14->7, C 24->48
    assert out.shape == (2, 2, 4, 4, 48)  # 28/4=7 tokens -> merge ceil to 4
    assert np.isfinite(np.asarray(out)).all()


def test_swin_has_frag_bias_params_only_where_configured(tiny_swin):
    model, variables = tiny_swin
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    frag = [n for n in names if "fragment_position_bias" in n]
    assert any("layers_0" in n for n in frag)
    assert not any("layers_1" in n for n in frag)


def test_swin_gradients_flow(tiny_swin):
    model, variables = tiny_swin
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 4, 28, 28, 3)), jnp.float32
    )

    def loss_fn(params):
        out = model.apply({"params": params}, {"technical": x}, train=False)
        return (out**2).mean()

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # bias tables receive gradient
    gsum = sum(float(np.abs(np.asarray(g)).sum()) for g in leaves)
    assert gsum > 0


def test_swin_remat_matches_no_remat():
    kw = dict(
        embed_dim=24, depths=(1,), num_heads=(2,), window_size=(2, 7, 7),
        frag_biases=(True,), jump_attention=(False,), drop_path_rate=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 4, 28, 28, 3)), jnp.float32
    )
    m1 = S.SwinTransformer3D(config=S.SwinConfig(use_checkpoint=False, **kw),
                             dtype=jnp.float32)
    v = m1.init(jax.random.key(0), {"technical": x}, train=False)
    m2 = S.SwinTransformer3D(config=S.SwinConfig(use_checkpoint=True, **kw),
                             dtype=jnp.float32)
    o1 = m1.apply(v, {"technical": x}, train=False)
    o2 = m2.apply(v, {"technical": x}, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_shifted_window_differs_from_unshifted():
    """Shift must change the computation (mask + roll active)."""
    kw = dict(
        embed_dim=24, depths=(2,), num_heads=(2,), window_size=(2, 7, 7),
        frag_biases=(False,), jump_attention=(False,),
        use_checkpoint=False, drop_path_rate=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 4, 28, 28, 3)), jnp.float32
    )
    model = S.SwinTransformer3D(config=S.SwinConfig(**kw), dtype=jnp.float32)
    v = model.init(jax.random.key(0), {"technical": x}, train=False)
    out = model.apply(v, {"technical": x}, train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_train_fwd_vmem_gate_routes_xla(monkeypatch):
    """The fused-train gate must check the FORWARD kernel's VMEM estimate
    too, not only the bwd's (r4 advisor finding (b), untested until now).

    With today's planners the bwd estimate structurally dominates (it
    carries the same bias planes PLUS f32 gradient accumulators — probed
    across window/head geometries, bwd > fwd everywhere), so the
    dangerous combination "fwd > 80 MB but bwd fits" is synthesized by
    stubbing the bwd estimate tiny on a REAL >80 MB-forward geometry —
    exactly the exposure a future bwd-planner change would create.  The
    gate must then take the XLA route; a positive control with both
    estimates stubbed tiny proves the kernel route (and this test's spy)
    actually engages."""
    import kvq_tpu.ops.window_attention as WA

    C, h = 384, 12
    MB = 1024 * 1024
    blk = S.SwinBlock3D(
        num_heads=h, window_size=(4, 14, 14), shift=True,
        frag_bias=True, use_pallas=True, dtype=jnp.float32,
    )
    xs = jax.ShapeDtypeStruct((1, 8, 28, 28, C), jnp.float32)
    vshapes = jax.eval_shape(
        lambda xx: blk.init(jax.random.key(0), xx, True), xs
    )

    probe = WA.WindowGeometry(
        batch=1, dims=(8, 28, 28), window=(4, 14, 14), shift=(2, 7, 7),
        fragments=(1, 7, 7), num_heads=h, head_dim=C // h, use_frag=True,
    )
    hidden = int(C * blk.mlp_ratio)
    # the geometry is REALLY over the fwd budget, and really over the bwd
    # one too (hence the stub below)
    assert S.fused_block_vmem_bytes(probe, C, hidden) > 80 * MB
    assert WA.train_block_vmem_bytes(probe, C, hidden) > 80 * MB

    class RouteTaken(Exception):
        pass

    def raiser(*a, **k):
        raise RouteTaken

    monkeypatch.setattr(WA, "train_swin_block", raiser)
    monkeypatch.setattr(WA, "fused_swin_block", raiser)
    monkeypatch.setattr(WA, "ALLOW_CPU_PALLAS", True)
    monkeypatch.setattr(WA, "TRAIN_INTERPRET", True)

    # NB: each part uses its OWN function object — eval_shape goes
    # through the jit trace cache, and a shared function + identical
    # avals would hand part (b) part (a)'s cached trace, skipping the
    # re-route entirely.

    # (a) bwd fits, fwd does not -> the gate must take the XLA route
    # (eval_shape: routing happens at trace time, no FLOPs are paid)
    monkeypatch.setattr(WA, "train_block_vmem_bytes", lambda *a: 1)
    out = jax.eval_shape(
        lambda p, xx: blk.apply({"params": p}, xx, True),
        vshapes["params"], xs,
    )
    assert out.shape == (1, 8, 28, 28, C)

    # (b) positive control: both estimates fit -> fused kernel route
    monkeypatch.setattr(S, "fused_block_vmem_bytes", lambda *a: 1)
    with pytest.raises(RouteTaken):
        jax.eval_shape(
            lambda p, xx: blk.apply({"params": p}, xx, True),
            vshapes["params"], xs,
        )


@pytest.mark.parametrize(
    "window", [(2, 7, 7), (8, 7, 7), (1, 3, 3), (3, 2, 4)]
)
def test_expand_bias_planes_grad_matches_scatter(window):
    """The separable matmul backward of expand_bias_planes must equal
    autodiff's scatter-add through the plain gather — across window
    shapes, for the full window and (via the fallback) the reference's
    [:N, :N] clamp slice."""
    n_full = window[0] * window[1] * window[2]
    table_len = (2 * window[0] - 1) * (2 * window[1] - 1) * (
        2 * window[2] - 1
    )
    h = 3
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(table_len, h)), jnp.float32)
    for n in (n_full, max(n_full - 11, 2)):  # full + a clamp-slice case
        cot = jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32)

        def loss_cv(t):
            return jnp.sum(S.expand_bias_planes(t, window, n) * cot)

        def loss_ref(t):
            rpi = S.relative_position_index(window)[:n, :n]
            planes = t[rpi.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
            return jnp.sum(planes * cot)

        v1, g1 = jax.value_and_grad(loss_cv)(table)
        v2, g2 = jax.value_and_grad(loss_ref)(table)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5,
            err_msg=f"n={n}",
        )
