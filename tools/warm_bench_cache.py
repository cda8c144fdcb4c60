"""Pre-build every gitignored .bench/ cache bench.py relies on.

The driver's round-end `python bench.py` builds the demo DB and the
131k large-T caches inline (under watchdogs), but the 524,288-target
cache is NEVER built inline — it takes ~15-20 min on 4 cores and would
starve the demo metric.  A fresh container therefore silently drops
`large_t_device_524k_reads_per_s` from the round's BENCH record unless
this script has run first.

Run early in every round (idempotent; skips layouts whose db.json
already exists):

    python tools/warm_bench_cache.py            # all caches
    python tools/warm_bench_cache.py --no-524k  # skip the big one

Builds, in order: demo DB + the 200k-read cache, the three 131k
layouts (db, db-uniform, db-wide), then the 524k db-uniform layout.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-524k", action="store_true",
                    help="skip the ~15-20 min 524,288-target build")
    args = ap.parse_args()

    import bench
    from tools.bench_large_t import build_db, build_uniform_db, build_wide_db

    t0 = time.time()
    bench.ensure_db(native=True)
    bench.make_reads(bench.N_READS)
    print(f"[warm] demo DB + reads: {time.time()-t0:.0f}s", file=sys.stderr)

    t0 = time.time()
    build_db(131072)
    build_uniform_db(131072)
    build_wide_db(131072)
    print(f"[warm] 131k layouts: {time.time()-t0:.0f}s", file=sys.stderr)

    if not args.no_524k:
        t0 = time.time()
        build_uniform_db(524288)
        print(f"[warm] 524k layout: {time.time()-t0:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
