"""Pure-Python tail probabilities for drift tests (driver-side, bytes-sized
inputs — SURVEY.md §2.11). scipy is not available in the sandbox, so the
standard series/continued-fraction forms are implemented directly.
"""

from __future__ import annotations

import math


def kolmogorov_sf(lam: float) -> float:
    """Q_KS(lambda) = 2 * sum_{j>=1} (-1)^{j-1} exp(-2 j^2 lambda^2).
    Survival function of the Kolmogorov distribution (asymptotic two-sample
    KS null)."""
    if lam <= 0:
        return 1.0
    total = 0.0
    for j in range(1, 101):
        term = 2.0 * ((-1.0) ** (j - 1)) * math.exp(-2.0 * j * j * lam * lam)
        total += term
        if abs(term) < 1e-12:
            break
    return min(max(total, 0.0), 1.0)


def ks_2samp_pvalue(d: float, n1: float, n2: float) -> float:
    """Asymptotic p-value for a two-sample KS statistic d."""
    if n1 <= 0 or n2 <= 0:
        return 1.0
    n_eff = n1 * n2 / (n1 + n2)
    lam = (math.sqrt(n_eff) + 0.12 + 0.11 / math.sqrt(n_eff)) * d
    return kolmogorov_sf(lam)


def _gamma_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x) via series (x < a+1) or
    continued fraction (x >= a+1)."""
    if x < 0 or a <= 0:
        raise ValueError("bad arguments to _gamma_p")
    if x == 0:
        return 0.0
    gln = math.lgamma(a)
    if x < a + 1.0:
        # series representation
        ap = a
        summ = 1.0 / a
        term = summ
        for _ in range(500):
            ap += 1.0
            term *= x / ap
            summ += term
            if abs(term) < abs(summ) * 1e-14:
                break
        return summ * math.exp(-x + a * math.log(x) - gln)
    # continued fraction for Q, then P = 1 - Q
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-14:
            break
    q = math.exp(-x + a * math.log(x) - gln) * h
    return 1.0 - q


def chi2_sf(x: float, k: float) -> float:
    """Chi-square survival function: P(X > x) with k degrees of freedom."""
    if x <= 0:
        return 1.0
    if k <= 0:
        raise ValueError("k must be positive")
    return max(0.0, min(1.0, 1.0 - _gamma_p(k / 2.0, x / 2.0)))
