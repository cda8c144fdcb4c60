"""Chained-barrier re-measure of the two-pass screened device search
(the >=512k-target production path): the round-2 numbers (91.5k raw at
131k, 86.6k at 524k) used per-batch pulls, which the round-3
methodology note shows floor at the tunnel's pull RTT — this probe
dispatches N batches back-to-back and pulls one tiny slice of the
last result (in-order completion barrier).

Usage: python tools/probe_screened.py [--targets 131072]
       [--batch 4096] [--nbatches 8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--targets", type=int, default=131072)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--nbatches", type=int, default=8)
    args = ap.parse_args()

    from kmcp_tpu.kmer import native
    from kmcp_tpu.search.device import DeviceDB
    from kmcp_tpu.search.engine import SearchEngine, SearchOptions
    from tools.bench_large_t import make_reads

    root = f".bench/large_t-{args.targets}"
    db = os.path.join(root, "db-uniform")
    B = args.batch
    reads = make_reads(os.path.join(root, "genomes"),
                       B * args.nbatches, 10.0)
    opt = SearchOptions(backend="jax", batch_size=B)
    engine = SearchEngine([db], opt)
    dev = DeviceDB(engine.dbs[0], opt)
    budget = B + B // 2  # production streaming budget
    seqs = [r[1] for r in reads]
    lens_all = np.array([len(s) for s in seqs], dtype=np.int64)
    lmax = max(-(-int(lens_all.max()) // 32) * 32, 21 + 31)
    pack4 = os.environ.get("KMCP_TPU_PACK4", "1") == "1"
    packer = native.pack_rows_4bit if pack4 else native.pack_rows
    mats = [
        (packer(seqs[lo:lo + B], lens_all[lo:lo + B], lmax),
         lens_all[lo:lo + B])
        for lo in range(0, len(seqs), B)
    ]
    t0 = time.time()
    m, _ = dev.search_reads_pallas(
        mats[0][0], mats[0][1], budget, packed4=pack4
    )
    n0 = int(np.asarray(m[:1])[0])
    print(f"[screened] compile+first {time.time()-t0:.1f}s "
          f"n_cand={n0}", file=sys.stderr)
    best = None
    for _ in range(2):
        t0 = time.time()
        m = None
        for mat, lens in mats:
            m, _a = dev.search_reads_pallas(
                mat, lens, budget, packed4=pack4
            )
        np.asarray(m[:1])
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    rps = B * len(mats) / best
    print(json.dumps({
        "targets": args.targets,
        "screened_step_reads_per_s": round(rps, 1),
        "batch": B,
        "seconds": round(best, 2),
    }))


if __name__ == "__main__":
    main()
