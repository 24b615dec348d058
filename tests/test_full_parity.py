"""Full-model numerical parity vs the reference torch implementation
(VERDICT r1 item 1 — the ±0.002 SRCC/PLCC north star reduces to per-video
score parity on identical weights + inputs).

Runs the reference's own code (kvq_tpu.compat.refload: stubbed third-party
deps, seeded random weights, eval mode so there is no RNG anywhere),
exports its state_dict through convert_*_full, and compares full-forward
scores.  Reference forwards: KSVQE_model.py:1389-1500 + head.py:42-68;
simpleVQA_model.py:226-262 + head.py:10-31.

Marked slow: the KSVQE pass compiles the full-size model (CLIP ViT-B/16 +
Swin-T 3D + CONTRIQUE-50) which takes minutes on a small-CPU host.  The
same check runs standalone via tools/parity_check.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow


def test_simplevqa_full_model_parity():
    from kvq_tpu.compat import parity

    r = parity.simplevqa_parity(B=2, T=4, size=224, seed=0)
    assert r["d_score"] < 1e-4, r


def test_ksvqe_full_model_parity():
    from kvq_tpu.compat import parity

    r = parity.ksvqe_parity(B=1, T=8, seed=0)
    # measured r2 (after the QRS nearest-resize fix): d_score 7.0e-6,
    # d_loss 1.4e-6 at B=2; generous headroom below the 1e-3 target
    assert r["d_score"] < 1e-4, r
    assert r["d_loss"] < 1e-4, r
