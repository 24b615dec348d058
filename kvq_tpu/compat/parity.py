"""Full-model numerical parity: reference torch forward vs kvq_tpu.

Builds the reference network with seeded random weights
(:mod:`kvq_tpu.compat.refload`), exports its ``state_dict``, imports it
through ``kvq_tpu.core.torch_import.convert_*_full``, and runs both
models on identical inputs in eval mode (hard top-k, dropout off — no
RNG anywhere), reporting max absolute score deltas.

This is the round-1 VERDICT's top item: the "SRCC/PLCC within 0.002"
north star reduces to per-video score parity, and rank correlations are
exactly preserved by any per-video error well below the label scale.
Reference forwards: KSVQE ``models/backbones/KSVQE_model.py:1389-1500``
(+ ``models/model.py:105-121`` arity, ``head.py:42-68``), SimpleVQA
``models/backbones/simpleVQA_model.py:226-262`` (+ ``head.py:10-31``).
"""

from __future__ import annotations

import contextlib
import io

import numpy as np

from . import refload as R


def _our_scores(config: dict, params, stats, batch_np: dict):
    import jax
    import jax.numpy as jnp

    from ..models.vqa_network import VQANetwork

    # full-size f32 'highest' graphs compile for minutes — persist them
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/kvq_jax_cache"
        )
    except Exception:
        pass

    model = VQANetwork(config=config)
    jb = {
        k: jnp.asarray(v)
        for k, v in batch_np.items()
    }
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats

    @jax.jit
    def fwd(variables, jb):
        return model.apply(variables, jb, train=False)

    # float32 parity needs real f32 matmuls on TPU (default precision
    # accumulates bf16 passes)
    with jax.default_matmul_precision("highest"):
        out = fwd(variables, jb)
    return out


def ksvqe_parity(B: int = 1, T: int = 8, seed: int = 0) -> dict:
    """Returns {'d_score': .., 'd_loss': .., 'ref_scores': .., 'our_scores': ..}."""
    import torch

    net = R.build_reference_ksvqe(seed=seed)
    ins = R.make_ksvqe_inputs(B=B, T=T, seed=seed + 1)
    batch_t = {
        "fragment": R.to_torch_video(ins["fragment"]),
        "resize_video": R.to_torch_video(ins["resize_video"]),
        "dis_label": torch.from_numpy(ins["dis_label"]),
    }
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        s_ref, dl_ref = net(batch_t)
    s_ref = s_ref.numpy().reshape(-1)
    dl_ref = float(dl_ref)

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    del net
    from ..core import torch_import as TI

    params, stats = TI.convert_ksvqe_full(sd)
    del sd

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
    batch_np = {
        "fragment": ins["fragment"],
        "resize_video": ins["resize_video"],
        "dis_label": ins["dis_label"].astype(np.int32),
    }
    scores, dl_our = _our_scores(cfg, params, stats, batch_np)
    s_our = np.asarray(scores[0]).reshape(-1)
    return {
        "d_score": float(np.abs(s_our - s_ref).max()),
        "d_loss": float(abs(float(dl_our) - dl_ref)),
        "ref_scores": s_ref.tolist(),
        "our_scores": s_our.tolist(),
    }


def simplevqa_parity(B: int = 2, T: int = 8, size: int = 448, seed: int = 0) -> dict:
    import torch

    net = R.build_reference_simplevqa(seed=seed)
    ins = R.make_simplevqa_inputs(B=B, T=T, size=size, seed=seed + 1)
    batch_t = {
        "simpleVQA": R.to_torch_video(ins["simpleVQA"]),
        "feat": torch.from_numpy(ins["feat"]),
    }
    with torch.no_grad():
        s_ref = net(batch_t)
    s_ref = s_ref.numpy().reshape(-1)

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    del net
    from ..core import torch_import as TI

    params, stats = TI.convert_simplevqa_full(sd)

    cfg = {
        "model": {
            "type": "simpleVQA",
            "compute_dtype": "float32",
            "args": {
                "simpleVQA": {
                    "backbone": {},
                    "head": {
                        "in_channels": 4096 + 2048 + 1024 + 2048 + 256,
                        "hidden_channels": 128,
                    },
                }
            },
        }
    }
    scores, = (_our_scores(cfg, params, stats, dict(ins)),)
    s_our = np.asarray(scores[0]).reshape(-1)
    return {
        "d_score": float(np.abs(s_our - s_ref).max()),
        "ref_scores": s_ref.tolist(),
        "our_scores": s_our.tolist(),
    }
