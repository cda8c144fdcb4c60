"""Real-TPU A/B probe: fused Pallas count kernels vs the XLA gather
tail on the dense 131k-target wide DB (.bench/large_t-131072/db-wide).

Verifies the candidate SET is identical across all three count cores
(XLA gather / DMA-ring kernel / VMEM-resident kernel — the kernels
emit bit-major order; the stream layer's lexsort normalizes it
downstream), then times each through the FULL jitted tail.

Timing methodology (round-3 correction): dispatch N batches back to
back with VARIED inputs and pull ONE tiny slice of the LAST result —
the device executes programs in order, so that pull is a completion
barrier for all N.  Pulling per batch, even pipelined at depth 4,
floors the measurement at the tunnel's pull RTT (105 ms on a degraded
tunnel — the round-2/early-round-3 "~42 GB/s DMA cap" was exactly this
floor, not a device property).

Usage: python tools/probe_pallas_count.py [--batch 1024] [--nbatches 16]
"""
import argparse
import json
import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--nbatches", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--targets", type=int, default=131072)
    ap.add_argument("--modes", default="xla,ring,resident,ring-mask,1")
    args = ap.parse_args()

    import jax

    from kmcp_tpu.kmer import native
    from kmcp_tpu.search.device import DeviceDB, _make_count_tail
    from kmcp_tpu.search.engine import SearchEngine, SearchOptions
    from tools.bench_large_t import make_reads

    db_dir = f".bench/large_t-{args.targets}/db-wide"
    gdir = f".bench/large_t-{args.targets}/genomes"
    B = args.batch
    reads = make_reads(gdir, B * args.nbatches, 10.0)
    opt = SearchOptions(backend="jax", batch_size=B)
    engine = SearchEngine([db_dir], opt)
    dev = DeviceDB(engine.dbs[0], opt)
    print(f"[probe] db loaded: {dev.total_rows} rows x {dev.w} words, "
          f"T={dev.t_per_block}", file=sys.stderr)

    budget = 4 * B
    seqs = [r[1] for r in reads]
    lens_all = np.array([len(s) for s in seqs], dtype=np.int64)
    lmax = max(-(-int(lens_all.max()) // 32) * 32, 21 + 31)
    mats = []
    for lo in range(0, len(seqs), B):
        mats.append((native.pack_rows(seqs[lo:lo + B],
                                      lens_all[lo:lo + B], lmax),
                     lens_all[lo:lo + B]))

    results = {}
    outs = {}
    all_modes = {"xla": "0", "ring": "ring", "resident": "resident",
                 "ring_mask": "ring-mask", "mask": "1"}
    sel = [m.replace("-", "_") if m != "1" else "mask"
           for m in args.modes.split(",")]
    sel = [("xla" if m == "0" else m) for m in sel]
    for name in sel:
        mode = all_modes[name]
        os.environ["KMCP_TPU_PALLAS_COUNT"] = mode
        _make_count_tail.cache_clear()
        t0 = time.time()
        r = dev.search_reads_pallas(mats[0][0], mats[0][1], budget)
        meta = np.asarray(r[0])
        aux = np.asarray(r[1])
        print(f"[probe] {name}: compile+first step {time.time()-t0:.1f}s, "
              f"n_cand={meta[0]}", file=sys.stderr)
        n = int(meta[0])
        assert 0 < n <= budget, (name, n)
        outs[name] = (np.sort(meta[1:1 + n]),
                      aux[:n][np.argsort(meta[1:1 + n])],
                      aux[budget:].copy())
        # timed: pipelined, varied inputs
        best = None
        for _ in range(args.reps):
            t0 = time.time()
            pend = deque()
            for mat, lens in mats:
                m, a = dev.search_reads_pallas(mat, lens, budget)
                try:
                    m.copy_to_host_async(); a.copy_to_host_async()
                except Exception:
                    pass
                pend.append(m)
                if len(pend) >= 4:
                    np.asarray(pend.popleft())[:1]
            while pend:
                np.asarray(pend.popleft())[:1]
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rps = B * len(mats) / best
        results[name] = {"reads_per_s": round(rps, 1),
                         "seconds": round(best, 2)}
        print(f"[probe] {name}: {rps:.0f} reads/s", file=sys.stderr)

    ref = sel[0]
    same = all(
        np.array_equal(outs[ref][i], outs[nm][i])
        for nm in sel[1:] for i in range(3)
    )
    K, T = 150 - 21 + 1, dev.t_per_block
    best_name = max(results, key=lambda nm: results[nm]["reads_per_s"])
    out = {
        "identical_candidates": bool(same),
        **{nm: results[nm] for nm in sel},
        "speedup": round(
            results[best_name]["reads_per_s"]
            / results[ref]["reads_per_s"], 2),
        "gbit_and_s": round(
            results[best_name]["reads_per_s"] * K * T / 1e9, 1),
        "batch": B,
    }
    print(json.dumps(out))
    assert same, "A/B mismatch!"


if __name__ == "__main__":
    main()
