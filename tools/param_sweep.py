"""Parameter-sweep accuracy harness (SURVEY §4.3 analog).

The reference validates parameter sensitivity by rebuilding databases
with chunks ∈ {1,5,10,20}, k, fpr and num-hash variations and measuring
profiling accuracy on mock communities
(/root/reference/benchmarks/accuracies-with-different-parameters/README.md).
This tool reproduces that harness on the demo-profiling community: one
simulated read set (same designed depths as demo-profiling/depth.tsv,
spanning 200x relative abundance), then for every (chunks, fpr,
num_hashes) config: compute -> index -> search -> profile, scoring
detection recall, false positives, and abundance error vs ground truth.

Usage: python tools/param_sweep.py [--scale 0.6] [--mode 1] [--json out]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFS = "/root/reference/demo-profiling/refs"
TAXDUMP = "/root/reference/demo-profiling/taxdump-custom"
TAXONOMY_TSV = "/root/reference/demo-profiling/taxonomy.tsv"

# demo-profiling/depth.tsv
DEPTHS = {
    "GCF_003697165.2": 1, "GCF_002949675.1": 1, "GCF_002950215.1": 1,
    "GCF_000742135.1": 1, "GCF_000006945.2": 1,
    "GCF_001544255.1": 0.1, "GCF_000392875.1": 0.1,
    "GCF_001457655.1": 0.1, "GCF_900638025.1": 0.1,
    "GCF_001027105.1": 0.05, "GCF_006742205.1": 0.05,
    "GCF_000148585.2": 0.01, "GCF_001096185.1": 0.01,
    "GCF_000017205.1": 0.005, "GCF_009759685.1": 0.005,
}
READ_LEN = 150

CONFIGS = [
    # (split_number, fpr, num_hashes)
    (1, 0.3, 1),
    (5, 0.3, 1),
    (10, 0.3, 1),
    (20, 0.3, 1),
    (10, 0.1, 1),
    (10, 0.05, 3),
    (10, 0.3, 3),
    (5, 0.1, 1),
]


def simulate_reads(tmp: str, scale: float):
    from kmcp_tpu.seqio.fastx import read_fastx

    rng = np.random.default_rng(7)
    fq = os.path.join(tmp, "mock.fq")
    truth = {}
    total_depth = 0.0
    n = 0
    with open(fq, "w") as f:
        for acc, depth in DEPTHS.items():
            seqs = [
                r.seq
                for r in read_fastx(os.path.join(REFS, acc + ".fa.gz"))
                if "plasmid" not in r.name
            ]
            genome = b"".join(seqs)
            gsize = len(genome)
            n_reads = int(depth * scale * gsize / READ_LEN)
            for _ in range(n_reads):
                p = rng.integers(0, gsize - READ_LEN)
                f.write(
                    f"@r{n}\n{genome[p : p + READ_LEN].decode()}\n"
                    f"+\n{'I' * READ_LEN}\n"
                )
                n += 1
            truth[acc] = depth
            total_depth += depth
    return fq, {k: v / total_depth * 100 for k, v in truth.items()}, n


def taxid_map():
    name2taxid = {}
    with open(os.path.join(TAXDUMP, "names.dmp")) as f:
        for line in f:
            parts = [p.strip() for p in line.split("|")]
            if len(parts) >= 4 and parts[3] == "scientific name":
                name2taxid[parts[1]] = int(parts[0])
    tmap = {}
    with open(TAXONOMY_TSV) as f:
        header = f.readline().rstrip("\n").split("\t")
        i_id, i_sp = header.index("id"), header.index("species")
        for line in f:
            parts = line.rstrip("\n").split("\t")
            tmap[parts[i_id]] = name2taxid[parts[i_sp]]
    return tmap


def run_config(tmp, fq, truth, tmap, n_chunks, fpr, num_hashes, mode):
    from kmcp_tpu.commands.compute import ComputeOptions, run_compute
    from kmcp_tpu.index.build import run_index
    from kmcp_tpu.profile.core import ProfileOptions, parse_search_tsv
    from kmcp_tpu.profile.fast import FastProfiler, flat_from_files
    from kmcp_tpu.profile.taxonomy import Taxonomy
    from kmcp_tpu.search.engine import SearchEngine, SearchOptions
    from kmcp_tpu.search.stream import StreamSearcher
    from kmcp_tpu.search.tsv import write_results

    tag = f"n{n_chunks}-f{fpr:g}-h{num_hashes}"
    work = os.path.join(tmp, tag)
    t0 = time.time()
    run_compute(
        out_dir=os.path.join(work, "ks"), in_dir=REFS,
        opt=ComputeOptions(
            ks=[21], split_number=n_chunks, split_overlap=150,
            ref_name_regexp=r"^([\w\.\_]+\.\d+)",
            seq_name_filter=["plasmid"],
        ),
        force=True, verbose=False,
    )
    run_index(
        in_dir=os.path.join(work, "ks"), out_dir=os.path.join(work, "db"),
        num_hashes=num_hashes, fpr=fpr, force=True, tpu_native=True,
        verbose=False,
    )
    t1 = time.time()

    opt = SearchOptions(backend="host", batch_size=32768)
    engine = SearchEngine([os.path.join(work, "db")], opt)
    tsv = os.path.join(work, "r.tsv")
    from kmcp_tpu.commands.search import iter_queries

    with open(tsv, "w") as out:
        queries = iter_queries([fq], None, None, False, False, "", 21)
        if StreamSearcher.usable(engine):
            total, matched = StreamSearcher(engine).run(queries, out)
        else:
            total = matched = 0
            batch = []
            for q in queries:
                batch.append(q)
                if len(batch) >= 32768:
                    t, m = write_results(out, engine.search_batch(batch, total))
                    total += t
                    matched += m
                    batch = []
            if batch:
                t, m = write_results(out, engine.search_batch(batch, total))
                total += t
                matched += m
    t2 = time.time()

    popt = ProfileOptions(mode=mode)
    parsed = flat_from_files([tsv], popt.max_fpr, popt.min_qcov)
    if parsed is None:
        parsed = parse_search_tsv([tsv], popt.max_fpr, popt.min_qcov)
    prof = FastProfiler(popt, taxdb=Taxonomy(TAXDUMP), taxid_map=tmap)
    targets = prof.run(parsed)
    t3 = time.time()

    est = {t.name: t.percentage for t in targets}
    detected = [a for a in truth if a in est]
    fp = [a for a in est if a not in truth]
    errs = [abs(est.get(a, 0.0) - truth[a]) for a in truth]
    res = {
        "chunks": n_chunks, "fpr": fpr, "num_hashes": num_hashes,
        "mode": mode,
        "detected": len(detected), "refs": len(truth), "false_pos": len(fp),
        "mean_abs_err_pct": round(float(np.mean(errs)), 3),
        "max_abs_err_pct": round(float(np.max(errs)), 3),
        "matched_pct": round(matched / total * 100, 2),
        "build_s": round(t1 - t0, 1), "search_s": round(t2 - t1, 1),
        "profile_s": round(t3 - t2, 1),
    }
    shutil.rmtree(work)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.6)
    ap.add_argument("--mode", type=int, default=1)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="kmcp_sweep_")
    try:
        fq, truth, n = simulate_reads(tmp, args.scale)
        print(f"[sweep] {n} reads over {len(truth)} refs "
              f"({min(truth.values()):.3f}%..{max(truth.values()):.1f}%)",
              file=sys.stderr)
        tmap = taxid_map()
        rows = []
        for n_chunks, fpr, num_hashes in CONFIGS:
            r = run_config(
                tmp, fq, truth, tmap, n_chunks, fpr, num_hashes, args.mode
            )
            rows.append(r)
            print(json.dumps(r))
        if args.json:
            with open(args.json, "w") as f:
                json.dump(rows, f, indent=1)
        print("\n| chunks | fpr | h | detected | FP | mean err | max err |",
              file=sys.stderr)
        print("|---|---|---|---|---|---|---|", file=sys.stderr)
        for r in rows:
            print(
                f"| {r['chunks']} | {r['fpr']:g} | {r['num_hashes']} "
                f"| {r['detected']}/{r['refs']} | {r['false_pos']} "
                f"| {r['mean_abs_err_pct']} | {r['max_abs_err_pct']} |",
                file=sys.stderr,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
