"""Head construction per model key (reference models/model.py:30-71:
simpleVQA uses simpleVQAHead, everything else VQAHead)."""

from __future__ import annotations

from ..nn.heads import SimpleVQAHead, VQAHead


def build_head(key: str, head_cfg: dict, dtype):
    head_cfg = dict(head_cfg or {})
    head_cfg.pop("in_channels", None)  # inferred from inputs in flax
    if key == "simpleVQA":
        return SimpleVQAHead(
            hidden_channels=head_cfg.get("hidden_channels", 128), dtype=dtype
        )
    return VQAHead(
        hidden_channels=head_cfg.get("hidden_channels", 64), dtype=dtype
    )
