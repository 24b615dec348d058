#!/usr/bin/env python
"""On-chip kernel verification: compiled Mosaic vs the XLA composition.

The CPU test suite exercises every kernel in INTERPRET mode; this tool
runs the real compiled kernels on the TPU and checks values + gradients
against the XLA composition at a compact geometry — including a
saturated-logit case, because the r4 fold-clamp zeroing bug was exactly
a TPU-only divergence (constant-folded vs VPU exp) that interpret-mode
tests could never see.

Run: python tools/check_kernels_on_chip.py   (exit 1 on mismatch)
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")

    from kvq_tpu.nn import swin as S
    from kvq_tpu.ops.window_attention import (
        WindowGeometry,
        _CLAMP_P,
        _FOLD_CLAMP,
        fused_swin_block,
        train_swin_block,
    )

    dims, window, shift = (4, 14, 14), (2, 7, 7), (1, 3, 3)
    B, h, hd = 1, 2, 8
    C, hidden = h * hd, 2 * h * hd
    N = 98
    nW = 8
    BW = B * nW
    scale = hd ** -0.5
    rng = np.random.default_rng(3)

    params = {
        "norm1_scale": jnp.asarray(1 + 0.1 * rng.normal(size=(C,)),
                                   jnp.float32),
        "norm1_bias": jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32),
        "qkv_w": jnp.asarray(rng.normal(size=(C, 3 * C), scale=0.3),
                             jnp.float32),
        "qkv_b": jnp.asarray(0.1 * rng.normal(size=(3 * C,)), jnp.float32),
        "proj_w": jnp.asarray(rng.normal(size=(C, C), scale=0.3),
                              jnp.float32),
        "proj_b": jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32),
        "norm2_scale": jnp.asarray(1 + 0.1 * rng.normal(size=(C,)),
                                   jnp.float32),
        "norm2_bias": jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32),
        "fc1_w": jnp.asarray(rng.normal(size=(C, hidden), scale=0.3),
                             jnp.float32),
        "fc1_b": jnp.asarray(0.1 * rng.normal(size=(hidden,)), jnp.float32),
        "fc2_w": jnp.asarray(rng.normal(size=(hidden, C), scale=0.3),
                             jnp.float32),
        "fc2_b": jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(BW, N, C)), jnp.float32)
    rel = jnp.asarray(rng.normal(size=(h, N, N), scale=0.5), jnp.float32)
    frag = jnp.asarray(rng.normal(size=(h, N, N), scale=0.5), jnp.float32)
    dp = jnp.ones((BW, 1), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(BW, N, C)), jnp.float32)

    geo = WindowGeometry(
        batch=B, dims=dims, window=window, shift=shift,
        fragments=(1, 7, 7), num_heads=h, head_dim=hd, use_frag=True,
    )
    gate = jnp.asarray(S.fragment_gate(dims, (1, 7, 7), window, shift))
    mask = jnp.asarray(S.compute_shift_mask(dims, window, shift))

    def golden(x, params, rel, frag, clamp=None):
        y = x
        mu = y.mean(-1, keepdims=True)
        var = jnp.maximum(0.0, (y * y).mean(-1, keepdims=True) - mu * mu)
        y = (y - mu) * jax.lax.rsqrt(var + 1e-6) * params["norm1_scale"] \
            + params["norm1_bias"]
        qkv = y @ params["qkv_w"] + params["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(BW, N, h, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q) * scale, heads(k), heads(v)
        s = jnp.einsum("whnd,whmd->whnm", q, k)
        bias = rel[None] * gate[:, None] + frag[None] * (1 - gate[:, None])
        s = s + jnp.tile(bias, (BW // nW, 1, 1, 1))
        s = s + jnp.tile(mask[:, None], (BW // nW, 1, 1, 1))
        if clamp is not None:
            pe = jnp.exp(jnp.minimum(s, clamp))
            p = pe / jnp.maximum(jnp.sum(pe, -1, keepdims=True), 1e-37)
        else:
            p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("whnm,whmd->whnd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(BW, N, C)
        att = o @ params["proj_w"] + params["proj_b"]
        x1 = x + att
        mu = x1.mean(-1, keepdims=True)
        var = jnp.maximum(0.0, (x1 * x1).mean(-1, keepdims=True) - mu * mu)
        y2 = (x1 - mu) * jax.lax.rsqrt(var + 1e-6) * params["norm2_scale"] \
            + params["norm2_bias"]
        mlp = jax.nn.gelu(y2 @ params["fc1_w"] + params["fc1_b"],
                          approximate=False) \
            @ params["fc2_w"] + params["fc2_b"]
        return x1 + mlp

    failures = []

    def check(tag, a, b, tol):
        d = float(jnp.max(jnp.abs(a - b)))
        r = max(1e-3, float(jnp.max(jnp.abs(b))))
        ok = d <= tol * r
        print(f"  {tag:28s} maxdiff {d:10.3e} refmax {r:9.3e} "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            failures.append(tag)

    print("[1] fused eval block (compiled) vs XLA golden", flush=True)
    out_k = jax.jit(
        lambda x, p, r, f: fused_swin_block(x, p, r, f, geo, scale=scale)
    )(x, params, rel, frag)
    out_g = jax.jit(golden)(x, params, rel, frag)
    check("eval block out", out_k.astype(jnp.float32), out_g, 5e-3)

    print("[2] train block (compiled fwd + fused bwd) vs XLA autodiff",
          flush=True)

    def loss_k(x, p, r, f):
        out = train_swin_block(x, p, r, f, geo, dp, dp, scale=scale)
        return jnp.sum(out * cot)

    def loss_g(x, p, r, f):
        return jnp.sum(golden(x, p, r, f) * cot)

    vk, gk = jax.jit(jax.value_and_grad(loss_k, argnums=(0, 1, 2, 3)))(
        x, params, rel, frag)
    vg, gg = jax.jit(jax.value_and_grad(loss_g, argnums=(0, 1, 2, 3)))(
        x, params, rel, frag)
    check("train value", vk[None], vg[None], 2e-3)
    for name, a, b in zip(("dx", "drel", "dfrag"),
                          (gk[0], gk[2], gk[3]), (gg[0], gg[2], gg[3])):
        check(f"train {name}", a, b, 1e-2)
    for kname in gk[1]:
        check(f"train d{kname}", gk[1][kname], gg[1][kname], 1e-2)

    print("[3] saturated logits on the REAL VPU exp (the r4 bug class)",
          flush=True)
    # Bimodal construction (same as the CPU fold-clamp test): every score
    # sits FAR from the clamp boundary, so TPU-vs-XLA matmul precision
    # cannot flip an entry's saturation classification.  q = constant
    # +-1 pattern via the bias; aligned tokens (x ~ pattern) score ~+90
    # per head, anti-aligned ~-90, all others are per-head-slice
    # orthogonalized against the pattern and score ~0.
    pattern = np.tile([1.0, -1.0], C // 2).astype(np.float32)
    big = 90.0 / (hd * scale)
    params_sat = dict(params)
    qkv_b = np.zeros((3 * C,), np.float32)
    qkv_b[:C] = pattern
    qkv_w = np.zeros((C, 3 * C), np.float32)
    qkv_w[:, C:2 * C] = big * np.eye(C)
    qkv_w[:, 2 * C:] = np.eye(C)
    params_sat["qkv_w"] = jnp.asarray(qkv_w)
    params_sat["qkv_b"] = jnp.asarray(qkv_b)
    params_sat["norm1_scale"] = jnp.ones((C,), jnp.float32)
    params_sat["norm1_bias"] = jnp.zeros((C,), jnp.float32)
    xr = np.asarray(x).copy()
    for hh in range(h):
        sl = slice(hh * hd, (hh + 1) * hd)
        ps = pattern[sl]
        proj = (xr[..., sl] @ ps) / hd
        xr[..., sl] -= proj[..., None] * ps
    x_sat = xr.copy()
    x_sat[:, 0:24:2] = pattern + 0.05 * xr[:, 0:24:2]
    x_sat[:, 1:8:2] = -pattern + 0.05 * xr[:, 1:8:2]
    x_sat = jnp.asarray(x_sat)
    rel0 = jnp.zeros((h, N, N), jnp.float32)
    frag0 = jnp.zeros((h, N, N), jnp.float32)
    vk, gk = jax.jit(jax.value_and_grad(loss_k, argnums=(0, 2)))(
        x_sat, params_sat, rel0, frag0)
    vg, gg = jax.jit(jax.value_and_grad(
        lambda x, p, r, f: jnp.sum(golden(x, p, r, f, clamp=_FOLD_CLAMP)
                                   * cot), argnums=(0, 2)))(
        x_sat, params_sat, rel0, frag0)
    check("saturated value", vk[None], vg[None], 2e-3)
    check("saturated dx", gk[0], gg[0], 1e-2)
    check("saturated drel", gk[1], gg[1], 1e-2)

    print("[4] flash window attention (packed eval + train custom_vjp)",
          flush=True)
    from kvq_tpu.ops.window_attention import (
        flash_window_attention_packed,
        window_attention_train,
    )

    qkv = rng.normal(size=(BW, N, 3 * C)).astype(np.float32)
    q5 = jnp.asarray(qkv[:, :, :C].reshape(BW, N, h, hd).transpose(0, 2, 1, 3))
    k5 = jnp.asarray(
        qkv[:, :, C:2 * C].reshape(BW, N, h, hd).transpose(0, 2, 1, 3))
    v5 = jnp.asarray(
        qkv[:, :, 2 * C:].reshape(BW, N, h, hd).transpose(0, 2, 1, 3))

    def attn_golden(q5, k5, v5, rel, frag):
        s = jnp.einsum("whnd,whmd->whnm", q5 * scale, k5)
        bias = rel[None] * gate[:, None] + frag[None] * (1 - gate[:, None])
        s = s + jnp.tile(bias, (BW // nW, 1, 1, 1))
        s = s + jnp.tile(mask[:, None], (BW // nW, 1, 1, 1))
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("whnm,whmd->whnd", p, v5)

    out_g = jax.jit(attn_golden)(q5, k5, v5, rel, frag)
    packed = jnp.asarray(
        np.swapaxes(qkv.reshape(BW, N, 3 * h, hd), 1, 2))
    out_k = jax.jit(
        lambda pk, r, f: flash_window_attention_packed(
            pk, h, r, f, geo, scale=scale)
    )(packed, rel, frag)
    check("packed eval attention", out_k.reshape(out_g.shape), out_g, 5e-3)

    cot5 = jnp.asarray(rng.normal(size=out_g.shape), jnp.float32)

    def loss_tr(q5, k5, v5, rel, frag):
        out = window_attention_train(q5, k5, v5, rel, frag, geo, scale=scale)
        return jnp.sum(out * cot5)

    def loss_ag(q5, k5, v5, rel, frag):
        return jnp.sum(attn_golden(q5, k5, v5, rel, frag) * cot5)

    vk, gk = jax.jit(jax.value_and_grad(loss_tr, argnums=(0, 1, 2, 3, 4)))(
        q5, k5, v5, rel, frag)
    vg, gg = jax.jit(jax.value_and_grad(loss_ag, argnums=(0, 1, 2, 3, 4)))(
        q5, k5, v5, rel, frag)
    check("flash-train value", vk[None], vg[None], 2e-3)
    for nm, a, b in zip(("dq", "dk", "dv", "drel", "dfrag"), gk, gg):
        check(f"flash-train {nm}", a, b, 1e-2)

    print("[5] no-bias CDM flash (channel layout)", flush=True)
    from kvq_tpu.ops.window_attention import flash_attention_nobias_cl

    Bq, Nq, Cc, hc = 4, 196, 64, 4
    qc = jnp.asarray(rng.normal(size=(Bq, Nq, Cc)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(Bq, Nq, Cc)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(Bq, Nq, Cc)), jnp.float32)
    sc = Cc ** -0.5

    def cdm_golden(qc, kc, vc):
        hdc = Cc // hc
        def heads(t):
            return t.reshape(Bq, -1, hc, hdc).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhnd,bhmd->bhnm", heads(qc) * sc, heads(kc))
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", p, heads(vc))
        return o.transpose(0, 2, 1, 3).reshape(Bq, Nq, Cc)

    out_k = jax.jit(
        lambda q, k, v: flash_attention_nobias_cl(
            q, k, v, num_heads=hc, scale=sc)
    )(qc, kc, vc)
    out_g = jax.jit(cdm_golden)(qc, kc, vc)
    check("cdm nobias out", out_k, out_g, 5e-3)

    if failures:
        print(f"FAILED: {failures}", flush=True)
        return 1
    print("all on-chip kernel checks OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
