"""Query false-positive statistics.

Theorem 2 of the Sequence Bloom Tree paper (Solomon & Kingsford,
doi:10.1038/nbt.3442): probability that >= k of n query k-mers hit a Bloom
filter with per-k-mer FPR p by chance.  Bit-compatible with the reference
(/root/reference/kmcp/cmd/util-fpr.go:28-50,140-191): the tail is computed
as ``1 - sum_{i<=k} C(n,i) p^i (1-p)^(n-i)`` with the same accumulation
order and early-outs, so float results are identical.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np


@lru_cache(maxsize=1 << 20)
def binomial_coeff(n: int, k: int) -> float:
    """C(n, k) with the reference's exact float semantics.

    util-fpr.go:54-71 uses big.Float at default (53-bit) precision with
    round-to-nearest-even, i.e. every interleaved multiply/divide rounds
    like an IEEE double op — which is precisely what Python floats do, so
    we replicate the same operation order for bit-identical results.
    """
    if k > n - k:
        k = n - k
    if k < 0:
        return 0.0
    res = 1.0
    for i in range(k):
        res = res * float(n - i)
        res = res / float(i + 1)
    return res


def query_fpr(n: int, k: int, fpr: float) -> float:
    """P(>= k of n k-mers are false positives); util-fpr.go:32-50."""
    r = 1.0
    for i in range(k + 1):
        coeff = binomial_coeff(n, i)
        if coeff == math.inf:
            return 0.0
        r -= coeff * math.pow(fpr, float(i)) * math.pow(1.0 - fpr, float(n - i))
        if r < 0:
            return 0.0
    return r


class QueryFPRCache:
    """Memoized query_fpr for a constant per-k-mer FPR
    (util-fpr.go:140-191).  buf_size: 249 single-end / 499 paired-end
    (search.go:250-255); larger n fall back to the direct computation."""

    def __init__(self, fpr: float, buf_size: int = 499):
        self.fpr = fpr
        self.buf_size = buf_size
        self._cache: dict[tuple[int, int], float] = {}

    def __call__(self, n: int, k: int) -> float:
        key = (n, min(k, n - k) if k > n - k else k)
        # the reference caches by (n, min(k, n-k)) index; note this merges
        # k and n-k entries exactly like the reference's triangular buffer.
        v = self._cache.get(key)
        if v is None:
            v = query_fpr(n, k, self.fpr)
            self._cache[key] = v
        return v

    def vector(self, n: np.ndarray, k: np.ndarray) -> np.ndarray:
        """Vectorized lookup for candidate matches."""
        out = np.empty(len(n), dtype=np.float64)
        for idx, (ni, ki) in enumerate(zip(n.tolist(), k.tolist())):
            out[idx] = self(ni, ki)
        return out


def chernoff_fpr(p: float, k: float, l: float) -> float:
    """Chernoff upper bound on query FPR (util-fpr.go:275-281)."""
    return math.exp(-l * (k - p) * (k - p) / (2.0 * (1.0 - p)))
