"""Bloom-filter sizing and hash-location derivation.

Bit-compatible with the reference (/root/reference/kmcp/cmd/util-hash.go):

- ``calc_signature_size``: COBS formula
  ``ceil(n * (-h / ln(1 - fpr^(1/h))))``  (util-hash.go:46-50)
- ``calc_fpr``: actual per-target FPR for a shared signature size
  (util-hash.go:55-57)
- multi-hash derivation: the single 64-bit ntHash value is split into
  ``a = hi32, b = lo32``; location i uses ``uint32(a + b*i)`` — note the
  deliberate uint32 wraparound (util-hash.go:61-82,125-142).
"""

from __future__ import annotations

import math

import numpy as np

_U32_MASK = np.uint64(0xFFFFFFFF)


def calc_signature_size(num_elements: int, num_hashes: int, fpr: float) -> int:
    """Number of Bloom-filter rows for the biggest member of a block."""
    if num_elements == 0:
        num_elements = 1
    ratio = float(-num_hashes) / math.log(1.0 - math.pow(fpr, 1.0 / num_hashes))
    return int(math.ceil(float(num_elements) * ratio))


def calc_fpr(num_elements: int, num_hashes: int, signature_size: int) -> float:
    """Actual FPR of a filter with fewer elements than the sizing maximum."""
    return math.pow(
        1.0 - math.pow(math.e, -num_hashes * float(num_elements) / float(signature_size)),
        float(num_hashes),
    )


def roundup64(x: int) -> int:
    """Round up to the next power of two (the reference's optional
    ``roundup64`` used with index --faster; util-hash.go:31-44)."""
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


def hash_values(hashes: np.ndarray, num_hashes: int) -> np.ndarray:
    """Derive ``num_hashes`` 64-bit values per input hash -> [N, h] uint64.

    h == 1 returns the input unchanged (expanded).  For h > 1 the values are
    ``uint64(uint32(a + b*i))`` with a=hi32, b=lo32 (util-hash.go:125-142).
    """
    hashes = np.asarray(hashes, dtype=np.uint64)
    if num_hashes <= 1:
        return hashes[:, None]
    a = (hashes >> np.uint64(32)).astype(np.uint32)
    b = (hashes & _U32_MASK).astype(np.uint32)
    i = np.arange(num_hashes, dtype=np.uint32)
    vals = a[:, None] + b[:, None] * i[None, :]  # uint32 wraparound
    return vals.astype(np.uint64)


def hash_locations(
    hashes: np.ndarray, num_hashes: int, num_sigs: int
) -> np.ndarray:
    """Bloom row positions -> [N, h] uint64 (util-hash.go:66-82)."""
    return hash_values(hashes, num_hashes) % np.uint64(num_sigs)
