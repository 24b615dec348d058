"""Fit and validate the block kernel's transcendental-free erf polynomial.

Produces the `_ERF_POLY` coefficients in ops/window_attention.py: erf(z)
is approximated as clip(z * P(min(z^2, 9)), -1, 1) with P a degree-10
polynomial in z^2, Chebyshev-fit on |z| <= 3 and evaluated by Horner in
f32.  Prints the coefficients and the achieved error bounds (f32 Horner
max |erf| error in-range, the clamp error at |z| > 3, and the resulting
max |GELU| absolute error — the number that must stay below the 2e-4
kernel-vs-XLA test tolerance and the bf16 resolution of the network).

Usage: python tools/fit_erf_poly.py [degree] [z_clamp]
"""

import sys
from math import erf

import numpy as np
from numpy.polynomial import chebyshev as C


def main():
    deg = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    zc = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0

    z = np.linspace(1e-9, zc, 40001)
    F = np.vectorize(erf)(z)
    coeffs = C.cheb2poly(C.chebfit(z * z, F / z, deg))

    # validate the exact kernel evaluation form in f32, in and out of range
    zt = np.concatenate(
        [np.linspace(-50, 50, 200001), np.linspace(-zc - 0.3, zc + 0.3,
                                                   200001)]
    ).astype(np.float32)
    u = np.minimum(zt * zt, np.float32(zc * zc))
    acc = np.zeros_like(u) + np.float32(coeffs[-1])
    for c in coeffs[-2::-1]:
        acc = acc * u + np.float32(c)
    approx = np.clip(zt * acc, -1.0, 1.0)
    true = np.vectorize(erf)(zt.astype(np.float64))
    err = np.abs(approx - true)
    h = zt * np.sqrt(2.0)
    gelu_err = np.abs(h) / 2 * err

    print(f"degree {deg} in z^2, clamp |z| <= {zc}")
    print(f"max |erf| error : {err.max():.3e} (at z={zt[err.argmax()]:.4f})")
    print(f"clamp error     : {1 - erf(zc):.3e}")
    print(f"max |GELU| error: {gelu_err.max():.3e} "
          f"(at h={h[gelu_err.argmax()]:.3f})")
    print("coefficients (constant term first):")
    print(",\n".join(f"    {c:.9e}" for c in coeffs))


if __name__ == "__main__":
    main()
