"""Closed-syncmer selection-rule hunt (VERDICT r1 item 5).

The reference's syncmer selection lives in the unvendored
``github.com/shenwei356/bio v0.9.0`` sketches package; only its demo
output survives on disk (demo-searching/README.md:28-60: qCov/tCov/jacc
of NC_018658.1 vs 9 E. coli genomes at k=31, s=15, scale=62).  This tool
evaluates a large family of candidate selection rules by *exact set
containment* (no Bloom noise) and ranks them against the golden table —
the correct rule must show small, non-negative deltas (the pipeline's
Bloom counts can only inflate qCov, never deflate it).

Usage: python tools/syncmer_hunt.py [--top 15]
"""

from __future__ import annotations

import argparse
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from kmcp_tpu.kmer.nthash import encode_seq, hash_windows
from kmcp_tpu.kmer.sketches import max_hash_for_scale
from kmcp_tpu.seqio.fastx import read_fastx

REFS = "/root/reference/demo-searching/refs"
K, S, SCALE = 31, 15, 62
QUERY = "NC_018658.1"

# golden rows (demo-searching/README.md:52-60): accession -> (qCov, tCov, jacc)
GOLDEN = {
    "NC_018658.1": (1.0000, 1.0000, 1.0000),
    "NZ_CP028116.1": (0.7439, 0.7189, 0.5763),
    "NC_000913.3": (0.6041, 0.6768, 0.4688),
    "NC_012971.2": (0.5972, 0.6807, 0.4665),
    "NZ_CP007592.1": (0.5782, 0.5868, 0.4109),
    "NC_002695.2": (0.5482, 0.5322, 0.3699),
}


def load_seq(path: str) -> bytes:
    """Whole-file sequence as compute's non-split mode sees it: records
    joined with k-1 Ns, 'plasmid'-named sequences dropped."""
    parts = []
    for rec in read_fastx(path):
        if "plasmid" in rec.name.lower():
            continue
        parts.append(rec.seq)
    return (b"N" * (K - 1)).join(parts)


def lex_codes(codes: np.ndarray, s: int) -> tuple[np.ndarray, np.ndarray]:
    """2-bit lexicographic codes (fwd, revcomp) of every s-mer; invalid
    bases poison via the validity mask computed separately."""
    n = codes.shape[0] - s + 1
    fwd = np.zeros(n, dtype=np.uint64)
    rc = np.zeros(n, dtype=np.uint64)
    c = np.minimum(codes, 3).astype(np.uint64)
    cc = np.uint64(3) - c
    for j in range(s):
        fwd = (fwd << np.uint64(2)) | c[j : n + j]
        rc |= cc[j : n + j] << np.uint64(2 * j)
    return fwd, rc


class Genome:
    def __init__(self, path: str):
        seq = load_seq(path)
        self.fh_k, self.rh_k, self.can_k, self.valid_k = hash_windows(seq, K)
        fh_s, rh_s, can_s, valid_s = hash_windows(seq, S)
        codes = encode_seq(seq)
        lf, lr = lex_codes(codes, S)
        U64 = np.uint64(0xFFFFFFFFFFFFFFFF)
        self.vals = {
            "can": np.where(valid_s, can_s, U64),
            "fwd": np.where(valid_s, fh_s, U64),
            "rc": np.where(valid_s, rh_s, U64),
            "lexf": np.where(valid_s, lf, U64),
            "lexc": np.where(valid_s, np.minimum(lf, lr), U64),
        }
        self.is_rc_k = self.rh_k < self.fh_k
        self._cache: dict = {}

    def view(self, val: str, w: int, rev: bool = False) -> np.ndarray:
        nk = self.can_k.shape[0]
        v = np.lib.stride_tricks.sliding_window_view(self.vals[val], w)[:nk]
        return v[:, ::-1] if rev else v

    def mn(self, val: str, w: int, rev: bool = False) -> np.ndarray:
        key = ("mn", val, w)
        if key not in self._cache:
            self._cache[key] = self.view(val, w).min(axis=1)
        return self._cache[key]

    def am(self, val: str, w: int, side: str, rev: bool = False) -> np.ndarray:
        """argmin index; side='left'/'right' picks first/last attaining
        position.  rev mirrors the window before the argmin."""
        key = ("am", val, w, side, rev)
        if key not in self._cache:
            view = self.view(val, w, rev)
            if side == "left":
                self._cache[key] = view.argmin(axis=1)
            else:
                self._cache[key] = w - 1 - view[:, ::-1].argmin(axis=1)
        return self._cache[key]


def select(g: Genome, val: str, w: int, ends: tuple[int, ...],
           tie: str, strand: str) -> np.ndarray:
    """Selected k-mer hash set for one candidate rule.

    val: which s-mer value array orders the window.
    w:   window width in s-mers (k-s+1 standard; k-s for off-by-one).
    ends: window offsets where the minimum must sit.
    tie: 'val' (any position attaining the min counts), 'left'/'right'
         (only the first/last argmin position counts).
    strand: 'plain' (forward coordinates) or 'canon' (mirror the test for
         k-mers whose canonical form is the reverse strand; 'fwd'/'lexf'
         values switch to the rc array read backwards).
    """
    nk = g.can_k.shape[0]

    def sel_of(val: str, rev: bool) -> np.ndarray:
        view = g.view(val, w, rev)
        if tie == "val":
            mn = g.mn(val, w)  # min is mirror-invariant
            s = np.zeros(nk, dtype=bool)
            for e in ends:
                s |= view[:, e] == mn
            return s
        am = g.am(val, w, tie, rev)
        return np.isin(am, ends)

    sel = sel_of(val, False)
    if strand == "canon":
        # the k-mer's own strand: for rc-canonical k-mers use the rc
        # s-mer values at mirrored offsets
        mirr = {"can": "can", "lexc": "lexc", "fwd": "rc", "lexf": "lexf"}
        sel2 = sel_of(mirr[val], val in ("fwd", "lexf"))
        sel = np.where(g.is_rc_k, sel2, sel)
    sel = sel & g.valid_k
    out = g.can_k[sel]
    out = out[out <= max_hash_for_scale(SCALE)]
    return np.unique(out[out > np.uint64(0)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    genomes: dict[str, Genome] = {}
    for f in sorted(os.listdir(REFS)):
        if f.endswith(".fasta.gz"):
            acc = f.rsplit(".fasta.gz", 1)[0]
            genomes[acc] = Genome(os.path.join(REFS, f))
            print(f"[hunt] loaded {acc}", file=sys.stderr)

    w_std = K - S + 1  # 17
    cases = []
    for val in ("can", "fwd", "lexf", "lexc"):
        for w, ends in (
            (w_std, (0, w_std - 1)),
            (w_std, (0,)),
            (w_std, (w_std - 1,)),
            (w_std, (0, w_std - 2)),
            (w_std, (1, w_std - 1)),
            (w_std - 1, (0, w_std - 2)),
        ):
            for tie in ("val", "left", "right"):
                for strand in ("plain", "canon"):
                    cases.append((val, w, ends, tie, strand))

    targets = [a for a in GOLDEN if a in genomes]
    missing = [a for a in GOLDEN if a not in genomes]
    if missing:
        print(f"[hunt] WARNING missing refs: {missing}", file=sys.stderr)

    results = []
    for case in cases:
        val, w, ends, tie, strand = case
        sets = {a: select(genomes[a], val, w, ends, tie, strand)
                for a in genomes}
        q = sets[QUERY]
        worst = 0.0
        neg = 0.0
        rows = []
        for a in targets:
            t = sets[a]
            inter = np.intersect1d(q, t, assume_unique=True).shape[0]
            qcov = inter / len(q) if len(q) else 0.0
            tcov = inter / len(t) if len(t) else 0.0
            jacc = inter / (len(q) + len(t) - inter) if inter else 0.0
            gq, gt, gj = GOLDEN[a]
            for got, gold in ((qcov, gq), (tcov, gt), (jacc, gj)):
                d = gold - got
                worst = max(worst, abs(d))
                neg = min(neg, d)
            rows.append((a, qcov, tcov, jacc))
        results.append((worst, neg, case, rows, len(q)))

    results.sort(key=lambda r: r[0])
    for worst, neg, case, rows, nq in results[: args.top]:
        val, w, ends, tie, strand = case
        print(f"max|d|={worst:.4f} minD={neg:+.4f} |Q|={nq} "
              f"val={val} w={w} ends={ends} tie={tie} strand={strand}")
    best = results[0]
    print("\nbest-case per-target values (got vs golden):")
    for a, qc, tc, jc in best[3]:
        gq, gt, gj = GOLDEN[a]
        print(f"  {a}: qCov {qc:.4f}/{gq:.4f} tCov {tc:.4f}/{gt:.4f} "
              f"jacc {jc:.4f}/{gj:.4f}")


if __name__ == "__main__":
    main()
