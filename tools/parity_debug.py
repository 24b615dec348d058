#!/usr/bin/env python
"""Bisect the KSVQE full-model parity delta (tools/parity_check.py) by
comparing intermediate activations between the reference torch forward and
the kvq_tpu forward on identical weights/inputs.

torch side: forward hooks on CLIP tool / QRS / patch embed / CONTRIQUE /
each Swin stage / final norm.  JAX side: flax ``capture_intermediates``.

    JAX_PLATFORMS=cpu python tools/parity_debug.py -T 8
"""

import argparse
import contextlib
import io
import sys

import numpy as np

sys.path.insert(0, ".")


def nhwc_from_torch(x):
    """torch (..., C, *spatial) conventions -> channels-last numpy."""
    a = x.detach().numpy()
    return a


def stat(name, ours, ref):
    ours = np.asarray(ours, np.float64).reshape(-1)
    ref = np.asarray(ref, np.float64).reshape(-1)
    if ours.shape != ref.shape:
        print(f"{name:28s} SHAPE MISMATCH ours{ours.shape} ref{ref.shape}")
        return
    d = np.abs(ours - ref)
    denom = np.abs(ref).mean() + 1e-8
    print(
        f"{name:28s} max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
        f"rel={d.mean() / denom:.3e}"
    )


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
    batch_t = {
        "fragment": R.to_torch_video(ins["fragment"]),
        "resize_video": R.to_torch_video(ins["resize_video"]),
        "dis_label": torch.from_numpy(ins["dis_label"]),
    }

    cap = {}
    bb = net.KSVQE_backbone

    def hook(name):
        def fn(mod, inp, out):
            cap[name] = out

        return fn

    bb.CLIP_tool.register_forward_hook(hook("clip"))
    bb.spa_patchnet.register_forward_hook(hook("x_sel_ori"))
    bb.patch_embed.register_forward_hook(hook("patch_embed"))
    bb.distortion_tool.register_forward_hook(hook("contrique"))
    for i, layer in enumerate(bb.layers):
        layer.register_forward_hook(hook(f"stage{i}"))
    bb.norm.register_forward_hook(hook("final_norm"))

    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        s_ref, dl_ref = net(batch_t)
    s_ref = s_ref.numpy().reshape(-1)

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    del net

    from kvq_tpu.core import torch_import as TI

    params, stats = TI.convert_ksvqe_full(sd)
    del sd

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/kvq_jax_cache")

    from kvq_tpu.models.vqa_network import VQANetwork

    cfg = {
        "model": {
            "type": "KSVQE",
            "compute_dtype": "float32",
            "args": {
                "KSVQE": {
                    "backbone": {
                        "num_samples": 1,
                        "sample_type": "topkpertubation",
                        "CLIP_location": 8,
                        "cls_use": True,
                        "tuning_stage": 1,
                        "a1": 1,
                        "a2": 2,
                        "checkpoint": False,
                    },
                    "head": {"in_channels": 768, "hidden_channels": 64},
                }
            },
        }
    }
    model = VQANetwork(config=cfg)
    jb = {
        "fragment": jnp.asarray(ins["fragment"]),
        "resize_video": jnp.asarray(ins["resize_video"]),
        "dis_label": jnp.asarray(ins["dis_label"].astype(np.int32)),
    }
    variables = {"params": params, "batch_stats": stats}

    @jax.jit
    def fwd(variables, jb):
        return model.apply(
            variables,
            jb,
            train=False,
            mutable=["intermediates"],
            capture_intermediates=True,
        )

    with jax.default_matmul_precision("highest"):
        (out, mut) = fwd(variables, jb)
    scores, dl_our = out
    inter = mut["intermediates"]["KSVQE_backbone"]

    def get(path):
        node = inter
        for p in path.split("/"):
            node = node[p]
        return node["__call__"][0]

    B, T = args.B, args.T

    # CLIP: ref (cls_attn, cls_token, pat[None]) vs ours (cls, _, pat)
    ref_attn, ref_cls, ref_pat = cap["clip"]
    our_clip = get("CLIP_tool")
    stat("clip/cls_attn", np.asarray(our_clip[0]), ref_attn.numpy())
    stat("clip/pat_tokens", np.asarray(our_clip[2]),
         ref_pat[0].numpy().reshape(np.asarray(our_clip[2]).shape))

    # x_sel_ori: ref (B,3,T,224,224) -> ours via patch-embed input is not
    # captured; compare through CONTRIQUE tokens instead + direct QRS out
    ref_sel = cap["x_sel_ori"].numpy().transpose(0, 2, 3, 4, 1)
    # contrique tokens (B, T/2, 49, 128)
    stat("contrique_tokens", np.asarray(get("distortion_tool")),
         cap["contrique"].numpy())

    # patch embed (ref (B,96,T/2,56,56) -> BTHWC)
    stat("patch_embed", np.asarray(get("patch_embed")),
         cap["patch_embed"].numpy().transpose(0, 2, 3, 4, 1))

    for i in range(4):
        ref_x = cap[f"stage{i}"]
        if isinstance(ref_x, tuple):
            ref_x = ref_x[0]
        name = f"layers_{i}"
        try:
            ours_x = np.asarray(get(name))
        except KeyError:
            print(f"stage{i}: no JAX intermediate '{name}'; keys:",
                  list(inter.keys())[:20])
            break
        stat(f"stage{i}", ours_x, ref_x.numpy().transpose(0, 2, 3, 4, 1))

    stat("scores", np.asarray(scores[0]).reshape(-1), s_ref)
    print("d_loss", abs(float(dl_our) - float(dl_ref)))
    print("jax intermediate keys:", sorted(inter.keys()))


if __name__ == "__main__":
    main()
