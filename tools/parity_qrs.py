#!/usr/bin/env python
"""Front-half parity: CLIP cls-attention -> QRS region selection.

Compares the reference's obtain_keyframes + CLIP_tool + spa_patchnet
(KSVQE_model.py:1403-1420, patchnet.py:461-550) against kvq_tpu's
CLIPVisionTower + RegionSelector on identical weights/inputs, per frame —
isolates whether the full-model delta originates in region selection.

    JAX_PLATFORMS=cpu python tools/parity_qrs.py -T 8
"""

import argparse
import contextlib
import io
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-T", type=int, default=8)
    ap.add_argument("-B", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import torch

    from kvq_tpu.compat import refload as R

    net = R.build_reference_ksvqe(seed=args.seed)
    ins = R.make_ksvqe_inputs(B=args.B, T=args.T, seed=args.seed + 1)
    frag_t = R.to_torch_video(ins["fragment"])
    rev_t = R.to_torch_video(ins["resize_video"])

    bb = net.KSVQE_backbone
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        group_id, key_frame = bb.obtain_keyframes(rev_t)
        b, n_key, c, h1, w1 = key_frame.shape
        cls_attn, cls_tok, pat = bb.CLIP_tool(key_frame.view(b * n_key, c, h1, w1))
        x_sel_ref = bb.spa_patchnet(
            frag_t, cls_attn.view(b, n_key, -1), bb.sigma, group_id
        )
    x_sel_ref = x_sel_ref.numpy().transpose(0, 2, 3, 4, 1)  # (B,T,224,224,3)
    cls_attn_ref = cls_attn.numpy()
    print("ref group_id:", group_id.numpy().reshape(-1).tolist()
          if hasattr(group_id, "numpy") else group_id)

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    del net

    from kvq_tpu.core import torch_import as TI

    params, _ = TI.convert_ksvqe_full(sd)
    clip_params = params["KSVQE_backbone"]["CLIP_tool"]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")

    from kvq_tpu.nn.clip_vit import CLIPVisionTower
    from kvq_tpu.nn.regionnet import RegionSelector, keyframe_schedule

    tower = CLIPVisionTower(
        width=768, layers=12, heads=12, clip_location=8, cls_use=True,
        dtype=jnp.float32,
    )
    B, T = args.B, args.T
    keyframes, group = keyframe_schedule(T)
    rev = jnp.asarray(ins["resize_video"])
    kf = rev[:, jnp.asarray(keyframes)].reshape(
        B * len(keyframes), *rev.shape[2:]
    )
    with jax.default_matmul_precision("highest"):
        cls_attn_our, _, _ = jax.jit(
            lambda p, x: tower.apply({"params": p}, x)
        )(clip_params, kf)
        sel = RegionSelector(k=49, anchor_size=32, num_samples=1)
        frag = jnp.asarray(ins["fragment"])
        x_sel_our = sel(
            frag,
            jnp.asarray(cls_attn_our).reshape(B, len(keyframes), -1),
            group,
            train=False,
        )
    cls_attn_our = np.asarray(cls_attn_our)
    x_sel_our = np.asarray(x_sel_our)

    print("our group_id:", list(group))
    d_attn = np.abs(cls_attn_our - cls_attn_ref).max()
    print(f"cls_attn     max|d| = {d_attn:.3e}")
    for t in range(T):
        d = np.abs(x_sel_our[0, t] - x_sel_ref[0, t]).max()
        print(f"x_sel frame {t}: max|d| = {d:.3e}")
    print(f"x_sel total  max|d| = {np.abs(x_sel_our - x_sel_ref).max():.3e}")

    # also report the region score vectors + argmax both ways
    from kvq_tpu.nn.regionnet import region_scores

    s_our = np.asarray(
        region_scores(jnp.asarray(cls_attn_our), (9, 9), 7)
    )
    print("our region scores (kf0):", np.round(s_our[0], 4).tolist(),
          "argmax:", s_our.argmax(-1).tolist())


if __name__ == "__main__":
    main()
