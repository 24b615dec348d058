"""Checkpoint conversion CLI — torch reference checkpoints -> kvq_tpu.

The reference loads torch checkpoints from hardcoded paths (LSVQ swin at
KSVQE_model.py:1028, CONTRIQUE at :1078, CLIP via download, full model
via `load_path`).  This tool converts any of them once into this
framework's msgpack checkpoint format, usable as ``load_path`` in
configs::

    python -m kvq_tpu.cli.convert --kind ksvqe \
        --src KSVQE_techniqual_pretrainonLSVQ.pth --out ksvqe_lsvq.ckpt

Kinds:
  ksvqe       full VQA_Network KSVQE checkpoint (KSVQE_backbone.* [+ head])
  simplevqa   full VQA_Network SimpleVQA checkpoint (ResNet-50 + MLP head)
  swin        (LSVQ-pretrained) Video-Swin trunk; fragment tables forked
              from the relative tables when absent (swin_backbone.py:945-952)
  contrique   CONTRIQUE_checkpoint25.tar (ResNet-50 encoder + projector)
  clip        OpenAI CLIP visual tower (ViT)
  clip_full   full OpenAI CLIP (visual + text encoders)
  resnet50    torchvision/ImageNet ResNet-50 (SimpleVQA spatial branch)
  slowfast    pytorchvideo slowfast_r50 (motion-feature extractor)
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser("kvq_tpu convert")
    p.add_argument("--kind", required=True,
                   choices=["ksvqe", "simplevqa", "swin", "swin2d",
                            "contrique", "clip", "clip_full", "resnet50",
                            "slowfast"])
    p.add_argument("--src", help="torch checkpoint path (or use --fetch)")
    p.add_argument("--fetch", metavar="NAME",
                   help="download the named pretrained checkpoint "
                        "(sha256-verified, cached in $KVQ_WEIGHTS_DIR) "
                        "instead of --src; see kvq_tpu.core.weights")
    p.add_argument("--no-download", action="store_true",
                   help="with --fetch: only use an already-cached file")
    p.add_argument("--out", required=True, help="output .ckpt path")
    p.add_argument("--clip_layers", type=int, default=12)
    args = p.parse_args(argv)
    if not args.src and not args.fetch:
        p.error("one of --src / --fetch is required")
    return args


def convert(kind: str, src: str, clip_layers: int = 12) -> dict:
    from ..core import torch_import as TI

    sd = TI.load_torch_state_dict(src)  # unwraps + strips DDP prefix
    if kind == "ksvqe":
        params, stats = TI.convert_ksvqe_full(sd, clip_layers=clip_layers)
    elif kind == "simplevqa":
        params, stats = TI.convert_simplevqa_full(sd)
    elif kind == "swin":
        params, stats = TI.convert_swin3d(sd), {}
    elif kind == "swin2d":
        params, stats = TI.convert_swin2d(sd), {}
    elif kind == "contrique":
        params, stats = TI.convert_contrique(sd)
    elif kind == "clip":
        params, stats = TI.convert_clip_visual(sd, n_layers=clip_layers), {}
    elif kind == "clip_full":
        params, stats = TI.convert_clip_full(sd)
    elif kind == "resnet50":
        params, stats = TI.convert_simplevqa_resnet50(sd)
    elif kind == "slowfast":
        params, stats = TI.convert_slowfast_r50(sd)
    else:  # pragma: no cover
        raise ValueError(kind)
    return {"params": params, "batch_stats": stats}


def main(argv=None):
    from ..core import checkpoint as ckpt

    args = parse_args(argv)
    src = args.src
    if not src:
        from ..core import weights

        src = weights.fetch(args.fetch, download=not args.no_download)
        print(f"using {src}")
    state = convert(args.kind, src, clip_layers=args.clip_layers)
    ckpt.save_checkpoint(args.out, state)

    def count(tree):
        n = 0
        for v in tree.values():
            n += count(v) if isinstance(v, dict) else 1
        return n

    print(
        f"wrote {args.out}: {count(state['params'])} param leaves, "
        f"{count(state['batch_stats'])} stat leaves"
    )


if __name__ == "__main__":
    main()
