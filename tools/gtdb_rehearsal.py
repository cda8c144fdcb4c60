"""GTDB-scale build rehearsal (VERDICT r1 item 3).

The reference's published profiling-DB build (GTDB r202, 47,894 genomes,
151.94 Gbp, k=21, 10 chunks/genome, 32 threads,
docs/database-time-and-mem-v2021.12.md:8-33):

    compute: 10m34s wall, peak RSS 3.87 GB, 978 GB temporary files
    index:   11m48s wall, peak RSS 13.95 GB, 58.03 GB database

Real GTDB genomes are not available in this environment, so this tool
rehearses the same pipeline shape at 5-50 Gbp with synthetic genomes:
N x 2 Mb genomes, k=21, 10 chunks each, tpu-native wide blocks +
block screens — exercising the billions-of-hashes sort/unique, the
>1000-file hashed output tree, and multi-GB block construction/writes,
and reporting wall / peak-RSS / bytes per stage with the per-Gbp
economics next to the reference's.

Usage: python tools/gtdb_rehearsal.py [--gbp 10] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GENOME_BP = 2_000_000
CHUNKS = 10
K = 21


class RssSampler:
    """Peak VmRSS of this process, sampled at 200 ms."""

    def __init__(self):
        self.peak = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.is_set():
            try:
                with open("/proc/self/status") as f:
                    for line in f:
                        if line.startswith("VmRSS:"):
                            rss = int(line.split()[1]) * 1024
                            self.peak = max(self.peak, rss)
                            break
            except OSError:
                pass
            self._stop.wait(0.2)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbp", type=float, default=10.0)
    ap.add_argument("--root", default=None)
    ap.add_argument("--keep", action="store_true",
                    help="keep the kset dir and db after the run")
    args = ap.parse_args()

    n_genomes = int(args.gbp * 1e9 / GENOME_BP)
    root = args.root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench", f"gtdb_rehearsal-{args.gbp:g}g",
    )
    gdir = os.path.join(root, "genomes")
    kdir = os.path.join(root, "ks")
    db = os.path.join(root, "db")

    # disk budget: genomes ~1 B/bp + kset ~8 B/k-mer (~8 B/bp) + db;
    # bytes already under root (a resumed/overwritten run) count as
    # available since the rerun replaces them in place
    need = args.gbp * 1e9 * 9.5
    free = shutil.disk_usage(os.path.dirname(root)).free
    if os.path.isdir(root):
        free += du(root)
    if free < need * 1.15:
        raise SystemExit(
            f"need ~{need / 1e9:.0f} GB free for a {args.gbp:g} Gbp "
            f"rehearsal, have {free / 1e9:.0f} GB"
        )

    report = {"gbp": args.gbp, "genomes": n_genomes, "k": K,
              "chunks_per_genome": CHUNKS, "threads": os.cpu_count()}

    # ---- stage 0: synthesize genomes
    os.makedirs(gdir, exist_ok=True)
    t0 = time.time()
    rng = np.random.default_rng(2026)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    files = []
    for g in range(n_genomes):
        path = os.path.join(gdir, f"g{g:06d}.fa")
        files.append(path)
        if os.path.isfile(path) and os.path.getsize(path) > GENOME_BP:
            continue
        seq = rng.choice(bases, size=GENOME_BP).tobytes()
        with open(path, "wb") as f:
            f.write(b">g%06d\n" % g)
            f.write(seq)
            f.write(b"\n")
    report["gen_s"] = round(time.time() - t0, 1)
    print(f"[rehearsal] {n_genomes} genomes ({args.gbp:g} Gbp): "
          f"{report['gen_s']}s", file=sys.stderr)

    # ---- stage 1: compute (k-mer sets; hashed output tree kicks in)
    from kmcp_tpu.commands.compute import ComputeOptions, run_compute

    t0 = time.time()
    with RssSampler() as rs:
        infos = run_compute(
            out_dir=kdir, files=files,
            opt=ComputeOptions(ks=[K], split_number=CHUNKS,
                               split_overlap=150),
            force=True,
        )
    report["compute_s"] = round(time.time() - t0, 1)
    report["compute_rss_gb"] = round(rs.peak / 1e9, 2)
    report["kset_files"] = len(infos)
    report["total_kmers"] = int(sum(i.kmers for i in infos))
    report["kset_gb"] = round(du(kdir) / 1e9, 2)
    report["compute_mbp_s"] = round(args.gbp * 1e3 / report["compute_s"], 1)
    print(f"[rehearsal] compute: {report['compute_s']}s, "
          f"RSS {report['compute_rss_gb']} GB, "
          f"{report['kset_files']} kset files, "
          f"{report['kset_gb']} GB, {report['compute_mbp_s']} Mbp/s",
          file=sys.stderr)

    # genomes are no longer needed; reclaim before the index stage
    if not args.keep:
        shutil.rmtree(gdir)

    # ---- stage 2: index (wide tpu-native blocks + union screens)
    from kmcp_tpu.index.build import run_index

    t0 = time.time()
    with RssSampler() as rs:
        run_index(
            in_dir=kdir, out_dir=db, num_hashes=1, fpr=0.3, force=True,
            tpu_native=True, block_screen=True,
        )
    report["index_s"] = round(time.time() - t0, 1)
    report["index_rss_gb"] = round(rs.peak / 1e9, 2)
    report["db_gb"] = round(du(db) / 1e9, 2)
    print(f"[rehearsal] index: {report['index_s']}s, "
          f"RSS {report['index_rss_gb']} GB, db {report['db_gb']} GB",
          file=sys.stderr)

    # reference economics (152 Gbp on 32 threads)
    ref_compute_core_s_per_gbp = 634 * 32 / 151.94
    ref_index_core_s_per_gbp = 708 * 32 / 151.94
    nthr = os.cpu_count() or 1
    report["compute_core_s_per_gbp"] = round(
        report["compute_s"] * nthr / args.gbp, 1
    )
    report["index_core_s_per_gbp"] = round(
        report["index_s"] * nthr / args.gbp, 1
    )
    report["ref_compute_core_s_per_gbp"] = round(ref_compute_core_s_per_gbp, 1)
    report["ref_index_core_s_per_gbp"] = round(ref_index_core_s_per_gbp, 1)

    print(json.dumps(report))
    if not args.keep:
        shutil.rmtree(root)


if __name__ == "__main__":
    main()
