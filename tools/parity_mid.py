#!/usr/bin/env python
"""Middle-module parity on identical inputs: patch_embed, CONTRIQUE, and
Swin stage 0, each run standalone with converted reference weights on the
*reference's own* x_sel tensor (tools/parity_qrs.py proved x_sel is
bit-identical).  Localizes the remaining KSVQE trunk delta.

    JAX_PLATFORMS=cpu python tools/parity_mid.py -T 8
"""

import argparse
import contextlib
import io
import sys

import numpy as np

sys.path.insert(0, ".")


def stat(name, ours, ref):
    ours = np.asarray(ours, np.float64)
    ref = np.asarray(ref, np.float64)
    if ours.shape != ref.shape:
        print(f"{name:16s} SHAPE ours{ours.shape} ref{ref.shape}")
        return
    d = np.abs(ours - ref)
    print(f"{name:16s} max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
          f"(ref mag {np.abs(ref).mean():.3e})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-T", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import torch

    from kvq_tpu.compat import refload as R

    net = R.build_reference_ksvqe(seed=args.seed)
    ins = R.make_ksvqe_inputs(B=1, T=args.T, seed=args.seed + 1)
    frag_t = R.to_torch_video(ins["fragment"])
    rev_t = R.to_torch_video(ins["resize_video"])
    bb = net.KSVQE_backbone

    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        group_id, key_frame = bb.obtain_keyframes(rev_t)
        b, n_key, c, h1, w1 = key_frame.shape
        cls_attn, _, _ = bb.CLIP_tool(key_frame.view(b * n_key, c, h1, w1))
        x_sel = bb.spa_patchnet(
            frag_t, cls_attn.view(b, n_key, -1), bb.sigma, group_id
        )  # (B,3,T,224,224)
        emb_ref = bb.patch_embed(x_sel)  # (B,96,T/2,56,56)
        dist_ref = bb.distortion_tool(x_sel[:, :, ::2])  # (B,T/2,49,128)
        stage0_ref = bb.layers[0](
            emb_ref.contiguous(), frag_t.size(-1) // 32, None
        )

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    del net

    from kvq_tpu.core import torch_import as TI

    params, stats = TI.convert_ksvqe_full(sd)
    bp = params["KSVQE_backbone"]
    bs = stats["KSVQE_backbone"]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")

    from kvq_tpu.nn.contrique import CONTRIQUE
    from kvq_tpu.nn.ksvqe import KSVQEConfig
    from kvq_tpu.nn.layers import PatchEmbed3D
    from kvq_tpu.nn.swin import SwinConfig, make_stages

    x_sel_np = x_sel.numpy().transpose(0, 2, 3, 4, 1)  # (B,T,224,224,3)

    with jax.default_matmul_precision("highest"):
        pe = PatchEmbed3D(patch_size=(2, 4, 4), embed_dim=96,
                          dtype=jnp.float32)
        emb_our = pe.apply({"params": bp["patch_embed"]},
                           jnp.asarray(x_sel_np))
        stat("patch_embed", emb_our,
             emb_ref.numpy().transpose(0, 2, 3, 4, 1))

        ct = CONTRIQUE(anchor_size=32, dtype=jnp.float32)
        dist_our = ct.apply(
            {"params": bp["distortion_tool"],
             "batch_stats": bs["distortion_tool"]},
            jnp.asarray(x_sel_np[:, ::2]),
        )
        stat("contrique", dist_our, dist_ref.numpy())

        kcfg = KSVQEConfig()
        scfg = SwinConfig(
            embed_dim=kcfg.embed_dim, depths=kcfg.depths,
            num_heads=kcfg.num_heads, window_size=kcfg.window_size,
            frag_biases=kcfg.frag_biases, use_checkpoint=False,
            drop_path_rate=kcfg.drop_path_rate,
        )
        stage0 = make_stages(scfg, jnp.float32)[0]
        s0_our = stage0.apply(
            {"params": bp["layers_0"]}, emb_our, train=False
        )
        ref0 = stage0_ref.numpy().transpose(0, 2, 3, 4, 1)
        stat("stage0", s0_our, ref0)


if __name__ == "__main__":
    main()
