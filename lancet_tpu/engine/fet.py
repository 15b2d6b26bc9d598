"""Fisher's exact test, identical numerics to the reference's samtools-derived
implementation (ref: src/FET.hh:43-127): incremental hypergeometric tail
accumulation with the same underflow cutoffs, so phred scores match bit-for-bit.
"""

from __future__ import annotations

import math


def _lbinom(n: int, k: int) -> float:
    if k == 0 or n == k:
        return 0.0
    return math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)


def _hypergeo(n11: int, n1_: int, n_1: int, n: int) -> float:
    return math.exp(_lbinom(n1_, n11) + _lbinom(n - n1_, n_1 - n11) - _lbinom(n, n_1))


class _Acc:
    __slots__ = ("n11", "n1_", "n_1", "n", "p")

    def __init__(self):
        self.n11 = self.n1_ = self.n_1 = self.n = 0
        self.p = 0.0


def _hypergeo_acc(n11: int, n1_: int, n_1: int, n: int, aux: _Acc) -> float:
    if n1_ or n_1 or n:
        aux.n11, aux.n1_, aux.n_1, aux.n = n11, n1_, n_1, n
    else:
        if n11 % 11 and n11 + aux.n - aux.n1_ - aux.n_1:
            if n11 == aux.n11 + 1:
                aux.p *= ((aux.n1_ - aux.n11) / n11) * (
                    (aux.n_1 - aux.n11) / (n11 + aux.n - aux.n1_ - aux.n_1)
                )
                aux.n11 = n11
                return aux.p
            if n11 == aux.n11 - 1:
                aux.p *= (aux.n11 / (aux.n1_ - n11)) * (
                    (aux.n11 + aux.n - aux.n1_ - aux.n_1) / (aux.n_1 - n11)
                )
                aux.n11 = n11
                return aux.p
        aux.n11 = n11
    aux.p = _hypergeo(aux.n11, aux.n1_, aux.n_1, aux.n)
    return aux.p


def kt_fisher_exact(n11: int, n12: int, n21: int, n22: int) -> tuple[float, float, float, float]:
    """Returns (prob, left, right, twotail) exactly as FET.hh:91-127."""
    n1_ = n11 + n12
    n_1 = n11 + n21
    n = n11 + n12 + n21 + n22
    mx = min(n_1, n1_)
    mn = n1_ + n_1 - n
    if mn < 0:
        mn = 0
    two = left = right = 1.0
    if mn == mx:
        return 1.0, left, right, two
    aux = _Acc()
    q = _hypergeo_acc(n11, n1_, n_1, n, aux)
    # left tail
    p = _hypergeo_acc(mn, 0, 0, 0, aux)
    left = 0.0
    i = mn + 1
    while p < 0.99999999 * q:
        left += p
        p = _hypergeo_acc(i, 0, 0, 0, aux)
        i += 1
    i -= 1
    if p < 1.00000001 * q:
        left += p
    else:
        i -= 1
    # right tail
    p = _hypergeo_acc(mx, 0, 0, 0, aux)
    right = 0.0
    j = mx - 1
    while p < 0.99999999 * q:
        right += p
        p = _hypergeo_acc(j, 0, 0, 0, aux)
        j -= 1
    j += 1
    if p < 1.00000001 * q:
        right += p
    else:
        j += 1
    two = left + right
    if two > 1.0:
        two = 1.0
    if abs(i - n11) < abs(j - n11):
        right = 1.0 - left + q
    else:
        left = 1.0 - right + q
    return q, left, right, two


_MAX_PHRED = -10.0 * math.log10(1 / 1.7976931348623157e308)  # DBL_MAX


def fet_phred(n11: int, n12: int, n21: int, n22: int) -> float:
    """Phred-scaled FET probability (ref: Variant.cc:246-278)."""
    prob, _, _, _ = kt_fisher_exact(n11, n12, n21, n22)
    if prob == 1.0:
        return 0.0
    if prob == 0.0:
        return _MAX_PHRED
    return -10.0 * math.log10(prob)


def fet_phred_nocap(n11: int, n12: int, n21: int, n22: int) -> float:
    """Phred FET without the prob==0 cap (ref: SB/HP scores,
    Variant.cc:281-318 — log10(0) would be -inf; C++ returns inf there)."""
    prob, _, _, _ = kt_fisher_exact(n11, n12, n21, n22)
    if prob == 1.0:
        return 0.0
    return -10.0 * math.log10(prob) if prob > 0.0 else math.inf
