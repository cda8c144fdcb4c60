"""ntHash1 correctness: vectorized path vs direct scalar definition,
canonical/reverse-complement invariants, N handling, circular mode."""

import numpy as np
import pytest

from kmcp_tpu.kmer import nthash
from kmcp_tpu.kmer.sketches import (
    closed_syncmer_sketch,
    hash_kmers,
    max_hash_for_scale,
    minimizer_sketch,
)

RNG = np.random.default_rng(42)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_seq(n, rng=RNG):
    return rng.choice(BASES, size=n).tobytes()


def revcomp(seq: bytes) -> bytes:
    table = bytes.maketrans(b"ACGTacgt", b"TGCAtgca")
    return seq.translate(table)[::-1]


def test_vectorized_matches_scalar():
    for k in (3, 5, 21, 31, 55, 64):
        seq = random_seq(200)
        h, pos = nthash.hash_all(seq, k)
        assert len(h) == 200 - k + 1
        for i in (0, 1, 7, len(h) - 1):
            expect = nthash._hash_kmer_scalar(seq[i : i + k])
            assert int(h[i]) == expect, (k, i)


def test_forward_not_canonical():
    seq = random_seq(100)
    k = 21
    hf, _ = nthash.hash_all(seq, k, canonical=False)
    for i in (0, 5, 50):
        expect = nthash._hash_kmer_scalar(seq[i : i + k], canonical=False)
        assert int(hf[i]) == expect


def test_canonical_revcomp_invariance():
    seq = random_seq(500)
    k = 31
    h1, _ = nthash.hash_all(seq, k)
    h2, _ = nthash.hash_all(revcomp(seq), k)
    assert sorted(h1.tolist()) == sorted(h2.tolist())


def test_n_windows_skipped():
    seq = bytearray(random_seq(100))
    seq[50] = ord("N")
    k = 21
    h, pos = nthash.hash_all(bytes(seq), k)
    # windows covering position 50 (starts 30..50) are dropped
    expect_positions = [i for i in range(100 - k + 1) if not (i <= 50 < i + k)]
    assert pos.tolist() == expect_positions
    # remaining hashes match the clean-subsequence hashes
    left, _ = nthash.hash_all(bytes(seq[:50]), k)
    right, _ = nthash.hash_all(bytes(seq[51:]), k)
    assert h.tolist() == left.tolist() + right.tolist()


def test_lowercase_equivalent():
    seq = random_seq(80)
    h1, _ = nthash.hash_all(seq, 15)
    h2, _ = nthash.hash_all(seq.lower(), 15)
    assert h1.tolist() == h2.tolist()


def test_short_seq_empty():
    h, pos = nthash.hash_all(b"ACGT", 21)
    assert len(h) == 0 and len(pos) == 0


def test_circular_adds_wrap_kmers():
    seq = random_seq(50)
    k = 11
    h_lin, _ = nthash.hash_all(seq, k)
    h_circ, _ = nthash.hash_all(seq, k, circular=True)
    assert len(h_circ) == len(h_lin) + k - 1
    # wrap k-mers equal hashes of seq+seq[:k-1] suffix windows
    ext = seq + seq[: k - 1]
    for j in range(k - 1):
        i = 50 - k + 1 + j
        assert int(h_circ[i]) == nthash._hash_kmer_scalar(ext[i : i + k])


def test_rol_ror_roundtrip():
    x = RNG.integers(0, 2**63, size=100, dtype=np.uint64)
    for r in (0, 1, 17, 63, 64, 100):
        r_arr = np.full(100, r, dtype=np.uint64)
        assert (nthash.ror64(nthash.rol64(x, r_arr), r_arr) == x).all()


def test_hash_distribution():
    # canonical = min(fh, rh) of two ~uniform hashes: mean near 2^64/3.
    seq = random_seq(100_000)
    h, _ = nthash.hash_all(seq, 31)
    mean = h.astype(np.float64).mean()
    expect = 2**64 / 3
    assert abs(mean - expect) / expect < 0.01
    # forward-only hashes are uniform: mean near 2^63.
    hf, _ = nthash.hash_all(seq, 31, canonical=False)
    meanf = hf.astype(np.float64).mean()
    assert abs(meanf - 2**63) / 2**63 < 0.01


def test_max_hash_for_scale_matches_go_float_semantics():
    # Go: uint64(float64(^uint64(0)) / float64(scale))
    # float64(2^64-1) rounds to 2^64 exactly.
    assert int(max_hash_for_scale(1000)) == int(
        np.uint64(np.float64(2**64) / np.float64(1000))
    )
    assert int(max_hash_for_scale(62)) == int(
        np.uint64(np.float64(2**64) / np.float64(62))
    )


def test_scaled_keeps_expected_fraction():
    seq = random_seq(200_000)
    h = hash_kmers(seq, 21, scale=100)
    all_h = hash_kmers(seq, 21, scale=1)
    frac = len(h) / len(all_h)
    # canonical hashes are min(fh, rh): P(min <= 2^64/scale) ~= 2/scale.
    assert 0.016 < frac < 0.024


def test_minimizer_subset_and_coverage():
    seq = random_seq(5000)
    k, w = 21, 10
    mins = minimizer_sketch(seq, k, w)
    allh = set(hash_kmers(seq, k).tolist())
    assert set(mins.tolist()) <= allh
    # density ~ 2/(w+1)
    n_kmers = 5000 - k + 1
    assert len(mins) < n_kmers
    assert len(mins) > n_kmers / (w + 1)


def test_closed_syncmer_subset_and_density():
    seq = random_seq(5000)
    k, s = 31, 15
    sync = closed_syncmer_sketch(seq, k, s)
    allh = set(hash_kmers(seq, k).tolist())
    assert set(sync.tolist()) <= allh
    # closed syncmer density ~ 2/(k-s+1)
    n_kmers = 5000 - k + 1
    density = len(sync) / n_kmers
    expect = 2 / (k - s + 1)
    assert abs(density - expect) / expect < 0.25


def test_syncmer_revcomp_invariance():
    seq = random_seq(2000)
    a = closed_syncmer_sketch(seq, 31, 15)
    b = closed_syncmer_sketch(revcomp(seq), 31, 15)
    assert sorted(a.tolist()) == sorted(b.tolist())


def test_hash_reads_batch_matches_per_read():
    reads = [random_seq(150) for _ in range(50)]
    reads += [b"ACGT", random_seq(31), b"ACGTNNNNNNNNNNNNNNNNNNNNNNNNNNNNACGT" * 3]
    H, M, counts = nthash.hash_reads_batch(reads, 21)
    for i, r in enumerate(reads):
        h, _ = nthash.hash_all(r, 21)
        h = h[h != 0]
        assert counts[i] == len(h)
        assert H[i, : len(h)].tolist() == h.tolist()
        assert M[i].sum() == len(h)


def test_fastx_edge_cases(tmp_path):
    from kmcp_tpu.seqio.fastx import read_fastx, xopen

    # multiline FASTA with CRLF and blank-ish records
    p = tmp_path / "x.fa"
    p.write_bytes(b">a desc here\r\nACGT\r\nACGT\r\n>b\nTTTT\n")
    recs = list(read_fastx(p))
    assert [r.id for r in recs] == ["a", "b"]
    assert recs[0].seq == b"ACGTACGT"
    assert recs[0].name == "a desc here"

    # gz write + read roundtrip
    g = tmp_path / "y.fq.gz"
    with xopen(g, "wt") as f:
        f.write("@r1\nACGTACGT\n+\nIIIIIIII\n")
    recs = list(read_fastx(g))
    assert recs[0].id == "r1" and recs[0].qual == b"IIIIIIII"


def test_slider_semantics():
    from kmcp_tpu.seqio.fastx import slider

    s = b"ABCDEFGHIJ"
    # exact fit: stops at the end
    assert [x for _, x in slider(s, 5, 5)] == [b"ABCDE", b"FGHIJ"]
    # greedy tail
    assert [x for _, x in slider(s, 4, 3, greedy=True)] == [
        b"ABCD", b"DEFG", b"GHIJ"]
    assert [x for _, x in slider(s, 4, 3, greedy=False)] == [
        b"ABCD", b"DEFG", b"GHIJ"]
    assert [x for _, x in slider(s, 6, 3, greedy=True)] == [
        b"ABCDEF", b"DEFGHI", b"GHIJ"]
    assert [x for _, x in slider(s, 6, 3, greedy=False)] == [
        b"ABCDEF", b"DEFGHI"]
    # circular wrap
    assert [x for _, x in slider(s, 6, 4, circular=True)] == [
        b"ABCDEF", b"EFGHIJ", b"IJABCD"]
