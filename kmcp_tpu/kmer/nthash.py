"""Vectorized ntHash1 rolling k-mer hashing (NumPy host path).

Implements the ntHash1 algorithm (Mohamadi et al., 2016) for canonical DNA
k-mer hashing, bit-compatible with the hash values the reference pipeline
derives through its sketches library (used at
/root/reference/kmcp/cmd/compute.go:746-803 and
/root/reference/kmcp/cmd/util-db-search.go:1037-1107).

Instead of the reference's sequential rolling update (one k-mer per loop
iteration), we use an O(L) data-parallel formulation built on a prefix-XOR
scan, which maps directly onto vector hardware:

    ntHash1 forward hash of window i (length k):
        fh[i] = XOR_{j=0..k-1} rol(seed(s[i+j]), k-1-j)

    Because rotation distributes over XOR, define
        B[j] = ror(seed(s[j]), j mod 64)
    and the exclusive prefix XOR  C[-1]=0, C[j] = B[0]^...^B[j].  Then
        fh[i] = rol(C[i+k-1] ^ C[i-1], (k-1+i) mod 64)

    Similarly for the reverse-complement hash with the complement seed table:
        D[j] = rol(seed(comp(s[j])), j mod 64),  E = prefix-XOR(D)
        rh[i] = ror(E[i+k-1] ^ E[i-1], i mod 64)

    canonical hash = min(fh, rh)   (ntHash NTC64 semantics)

Windows containing a non-ACGT base produce no hash (the reference iterator
skips them; this is what makes the k-1 'N' joins between concatenated
sequences act as hard separators, compute.go:569).
"""

from __future__ import annotations

import numpy as np

# ntHash1 seed constants (Mohamadi et al. 2016, bcgsc/ntHash v1).
SEED_A = np.uint64(0x3C8BFBB395C60474)
SEED_C = np.uint64(0x3193C18562A02B4C)
SEED_G = np.uint64(0x20323ED082572324)
SEED_T = np.uint64(0x295549F54BE24456)

_U64_1 = np.uint64(1)
_U64_63 = np.uint64(63)
_U64_64 = np.uint64(64)

# Base codes: A=0 C=1 G=2 T=3, anything else = 4 (invalid).
BASE_CODE = np.full(256, 4, dtype=np.uint8)
for _b, _c in zip(b"ACGT", range(4)):
    BASE_CODE[_b] = _c
for _b, _c in zip(b"acgt", range(4)):
    BASE_CODE[_b] = _c

# Seed tables indexed by base code (index 4 = invalid -> 0, never emitted).
SEEDS = np.array([SEED_A, SEED_C, SEED_G, SEED_T, 0], dtype=np.uint64)
# Complement seeds: comp(A)=T, comp(C)=G, comp(G)=C, comp(T)=A.
SEEDS_COMP = np.array([SEED_T, SEED_G, SEED_C, SEED_A, 0], dtype=np.uint64)

COMPLEMENT_CODE = np.array([3, 2, 1, 0, 4], dtype=np.uint8)


def rol64(x: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Rotate-left uint64 by r (elementwise); r is taken mod 64."""
    x = np.asarray(x, dtype=np.uint64)
    r = np.asarray(r, dtype=np.uint64) & _U64_63
    # (64 - r) % 64 keeps the complementary shift in [0, 63]; for r == 0 both
    # shifts are 0 and x | x == x.
    return (x << r) | (x >> ((_U64_64 - r) & _U64_63))


def ror64(x: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Rotate-right uint64 by r (elementwise); r is taken mod 64."""
    x = np.asarray(x, dtype=np.uint64)
    r = np.asarray(r, dtype=np.uint64) & _U64_63
    return (x >> r) | (x << ((_U64_64 - r) & _U64_63))


def encode_seq(seq: bytes | bytearray | np.ndarray) -> np.ndarray:
    """Map ASCII sequence bytes to base codes (A=0 C=1 G=2 T=3, invalid=4)."""
    if isinstance(seq, np.ndarray):
        arr = seq.astype(np.uint8, copy=False)
    else:
        arr = np.frombuffer(bytes(seq), dtype=np.uint8)
    return BASE_CODE[arr]


def _window_hashes(codes: np.ndarray, k: int):
    """Forward and reverse-complement ntHash1 for every window of ``codes``.

    Returns (fh, rh, valid) arrays of length L-k+1.  Invalid windows (those
    containing a code > 3) are flagged in ``valid``; their hash values are
    unspecified.
    """
    L = codes.shape[0]
    n = L - k + 1
    if n <= 0:
        e = np.empty(0, dtype=np.uint64)
        return e, e, np.empty(0, dtype=bool)

    idx = np.arange(L, dtype=np.uint64)

    # Exclusive-prefix-XOR of position-derotated seeds.
    b = ror64(SEEDS[codes], idx)
    c = np.bitwise_xor.accumulate(b)
    d = rol64(SEEDS_COMP[codes], idx)
    e = np.bitwise_xor.accumulate(d)

    i = np.arange(n, dtype=np.uint64)
    hi = i + np.uint64(k - 1)
    # C[i-1]: 0 for i == 0.
    c_prev = np.empty(n, dtype=np.uint64)
    c_prev[0] = 0
    c_prev[1:] = c[: n - 1]
    e_prev = np.empty(n, dtype=np.uint64)
    e_prev[0] = 0
    e_prev[1:] = e[: n - 1]

    fh = rol64(c[hi] ^ c_prev, i + np.uint64(k - 1))
    rh = ror64(e[hi] ^ e_prev, i)

    bad = (codes > 3).astype(np.int64)
    cbad = np.cumsum(bad)
    cbad_prev = np.empty(n, dtype=np.int64)
    cbad_prev[0] = 0
    cbad_prev[1:] = cbad[: n - 1]
    valid = (cbad[k - 1 :] - cbad_prev) == 0

    return fh, rh, valid


def _scan_windows(buf: bytes, k: int, canonical: bool):
    """All-window hashes + validity for a raw byte buffer.

    Prefers the C++ rolling scanner (native/nthash.cpp); falls back to the
    NumPy prefix-XOR path.  Both produce identical values.
    """
    from . import native

    res = native.scan(buf, k, canonical)
    if res is not None:
        return res
    codes = encode_seq(buf)
    fh, rh, valid = _window_hashes(codes, k)
    return (np.minimum(fh, rh) if canonical else fh), valid


def hash_all(
    seq: bytes | bytearray | np.ndarray,
    k: int,
    canonical: bool = True,
    circular: bool = False,
):
    """ntHash1 of every k-mer of ``seq``.

    Returns ``(hashes, positions)``: uint64 hash and 0-based start position of
    each *valid* k-mer window, in sequence order.  Mirrors the reference's
    ``sketches.NewHashIterator(seq, k, canonical, circular)`` +
    ``NextHash()`` loop (compute.go:752, util-db-search.go:1057).
    """
    if isinstance(seq, np.ndarray):
        seq = seq.tobytes()
    else:
        seq = bytes(seq)
    L = len(seq)
    if L < k or k < 1:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    if circular and L > k - 1:
        seq = seq + seq[: k - 1]

    h, valid = _scan_windows(seq, k, canonical)
    pos = np.nonzero(valid)[0]
    return h[pos], pos


def hash_windows(
    seq: bytes | bytearray | np.ndarray,
    k: int,
    circular: bool = False,
):
    """Forward/reverse/canonical hashes + validity for every window.

    Lower-level variant of :func:`hash_all` used by the sketch generators
    (minimizer / syncmer) which need per-position alignment.
    Returns (fh, rh, canonical, valid) of length L-k+1 (after circular ext.).
    """
    codes = encode_seq(seq)
    L = codes.shape[0]
    if L < k or k < 1:
        e = np.empty(0, dtype=np.uint64)
        return e, e, e, np.empty(0, dtype=bool)
    if circular and L > k - 1:
        codes = np.concatenate([codes, codes[: k - 1]])
    fh, rh, valid = _window_hashes(codes, k)
    return fh, rh, np.minimum(fh, rh), valid


def hash_reads_batch(
    seqs: list[bytes],
    k: int,
    canonical: bool = True,
    k_max_pad: int = 0,
    max_hash: int | None = None,
):
    """Hash a batch of short reads in ONE vectorized pass.

    Joins all reads with a single 'N' separator (invalid windows at the
    junctions are dropped automatically — the same mechanism the reference
    uses with k-1 'N' joins) and runs the prefix-XOR ntHash once over the
    concatenated buffer.  Returns a padded ``[B, Kmax]`` uint64 hash matrix,
    a ``[B, Kmax]`` validity mask, and the per-read k-mer counts.

    Per-read results are identical to ``hash_all(seq, k)`` for each read —
    duplicates kept, sequence order preserved (matching the reference's
    per-query k-mer generation, util-db-search.go:1092-1105, including the
    ``code > 0`` drop).
    """
    B = len(seqs)
    if B == 0:
        z = np.zeros((0, 0), dtype=np.uint64)
        return z, np.zeros((0, 0), dtype=bool), np.zeros(0, dtype=np.int64)
    joined = b"N".join(bytes(s) for s in seqs)
    L = len(joined)

    # read r occupies [starts[r], starts[r] + len_r)
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    starts = np.zeros(B, dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])

    if L < k:
        kmax = max(1, k_max_pad)
        return (
            np.zeros((B, kmax), dtype=np.uint64),
            np.zeros((B, kmax), dtype=bool),
            np.zeros(B, dtype=np.int64),
        )

    h, valid = _scan_windows(joined, k, canonical)
    # drop hash == 0 like the reference
    valid = valid & (h != 0)
    if max_hash is not None:
        valid = valid & (h <= np.uint64(max_hash))
    if B == 1 and k_max_pad == 0:
        # single huge read (whole-file queries): skip the padded-matrix
        # scatter entirely — the compressed vector IS row 0
        hv = h[valid]
        n = len(hv)
        return (
            hv.reshape(1, -1) if n else np.zeros((1, 1), np.uint64),
            np.ones((1, n), dtype=bool) if n else np.zeros((1, 1), bool),
            np.array([n], dtype=np.int64),
        )
    pos = np.nonzero(valid)[0]
    hv = h[pos]
    # Windows of read r occupy the contiguous range [starts[r], starts[r+1])
    # (junction windows are invalid), so B binary searches of the sorted
    # ``pos`` array give per-read extents — O(B log N), not O(N log B).
    bounds = np.searchsorted(pos, starts)
    counts = np.empty(B, dtype=np.int64)
    counts[:-1] = np.diff(bounds)
    counts[-1] = len(pos) - bounds[-1]
    kmax = max(int(counts.max()) if B else 0, k_max_pad, 1)
    rid = np.repeat(np.arange(B, dtype=np.int64), counts)
    # column index = rank of the k-mer within its read
    col = np.arange(len(pos), dtype=np.int64) - np.repeat(bounds, counts)
    out = np.zeros((B, kmax), dtype=np.uint64)
    mask = np.zeros((B, kmax), dtype=bool)
    out[rid, col] = hv
    mask[rid, col] = True
    return out, mask, counts


# ---------------------------------------------------------------------------
# Scalar reference implementation (for testing the vectorized path only).


def _hash_kmer_scalar(kmer: bytes, canonical: bool = True) -> int | None:
    """Direct (non-rolling) ntHash1 of a single k-mer; None if invalid."""
    k = len(kmer)
    codes = encode_seq(kmer)
    if (codes > 3).any():
        return None
    fh = 0
    for j, c in enumerate(codes):
        fh ^= int(rol64(SEEDS[c], np.uint64((k - 1 - j) % 64)))
    if not canonical:
        return fh
    rh = 0
    for j, c in enumerate(codes[::-1]):
        rh ^= int(rol64(SEEDS_COMP[c], np.uint64((k - 1 - j) % 64)))
    return min(fh, rh)
