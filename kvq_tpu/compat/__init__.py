"""Interop with the PyTorch reference implementation.

``kvq_tpu.compat.refload`` imports the reference repo's own model code
(read-only checkout, default ``/root/reference``) so full-model forward
outputs can be compared numerically against this rebuild on identical
weights and inputs.  Used by ``tools/parity_check.py`` and
``tests/test_full_parity.py``; requires ``torch`` (CPU is fine).
"""
