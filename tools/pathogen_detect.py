"""Low-abundance pathogen-detection scenario (preset mode 0's purpose).

The reference's flagship profiling claim is confident detection of
low-coverage pathogens (README.md:72-75; preset mode 0 sets
keep-main-matches and drops the unique-read/coverage floors,
profile.go:226-334).  This tool spikes one pathogen genome into a
5-genome background community at decreasing relative depth and records,
for preset modes 0/1/3, whether the pathogen is called and at what
estimated abundance — the sensitivity/precision trade the presets
encode.

Usage: python tools/pathogen_detect.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.param_sweep import READ_LEN, REFS, TAXDUMP, taxid_map

BACKGROUND = [
    "GCF_003697165.2", "GCF_002949675.1", "GCF_002950215.1",
    "GCF_000742135.1", "GCF_000006945.2",
]
PATHOGEN = "GCF_000017205.1"  # P. aeruginosa, ~6.6 Mb
SPIKES = [3e-3, 1e-3, 3e-4, 1e-4]  # pathogen depth relative to background
MODES = [0, 1, 3]


def _genome(acc: str) -> bytes:
    from kmcp_tpu.seqio.fastx import read_fastx

    return b"".join(
        r.seq
        for r in read_fastx(os.path.join(REFS, acc + ".fa.gz"))
        if "plasmid" not in r.name
    )


def simulate(tmp: str, spike: float, scale: float = 0.6):
    rng = np.random.default_rng(11)
    fq = os.path.join(tmp, f"spike{spike:g}.fq")
    n = 0
    counts = {}
    with open(fq, "w") as f:
        for acc in BACKGROUND + [PATHOGEN]:
            g = _genome(acc)
            depth = spike if acc == PATHOGEN else 1.0
            n_reads = max(int(depth * scale * len(g) / READ_LEN), 1)
            counts[acc] = n_reads
            for _ in range(n_reads):
                p = rng.integers(0, len(g) - READ_LEN)
                f.write(
                    f"@r{n}\n{g[p : p + READ_LEN].decode()}\n"
                    f"+\n{'I' * READ_LEN}\n"
                )
                n += 1
    return fq, counts[PATHOGEN], n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from kmcp_tpu.commands.compute import ComputeOptions, run_compute
    from kmcp_tpu.commands.search import iter_queries
    from kmcp_tpu.index.build import run_index
    from kmcp_tpu.profile.core import ProfileOptions, parse_search_tsv
    from kmcp_tpu.profile.fast import FastProfiler, flat_from_files
    from kmcp_tpu.profile.taxonomy import Taxonomy
    from kmcp_tpu.search.engine import SearchEngine, SearchOptions
    from kmcp_tpu.search.stream import StreamSearcher

    tmp = tempfile.mkdtemp(prefix="kmcp_pathogen_")
    rows = []
    try:
        run_compute(
            out_dir=os.path.join(tmp, "ks"), in_dir=REFS,
            opt=ComputeOptions(
                ks=[21], split_number=10, split_overlap=150,
                ref_name_regexp=r"^([\w\.\_]+\.\d+)",
                seq_name_filter=["plasmid"],
            ),
            force=True, verbose=False,
        )
        run_index(
            in_dir=os.path.join(tmp, "ks"), out_dir=os.path.join(tmp, "db"),
            num_hashes=1, fpr=0.3, force=True, tpu_native=True,
            verbose=False,
        )
        tmap = taxid_map()
        taxdb = Taxonomy(TAXDUMP)
        engine = SearchEngine(
            [os.path.join(tmp, "db")],
            SearchOptions(backend="host", batch_size=32768),
        )
        for spike in SPIKES:
            fq, n_pathogen, n_total = simulate(tmp, spike)
            tsv = os.path.join(tmp, "r.tsv")
            with open(tsv, "w") as out:
                StreamSearcher(engine).run(
                    iter_queries([fq], None, None, False, False, "", 21),
                    out,
                )
            for mode in MODES:
                popt = ProfileOptions(mode=mode)
                parsed = flat_from_files([tsv], popt.max_fpr, popt.min_qcov)
                if parsed is None:
                    parsed = parse_search_tsv(
                        [tsv], popt.max_fpr, popt.min_qcov
                    )
                prof = FastProfiler(popt, taxdb=taxdb, taxid_map=tmap)
                targets = prof.run(parsed)
                est = {t.name: t.percentage for t in targets}
                fp = [a for a in est if a not in BACKGROUND + [PATHOGEN]]
                r = {
                    "spike_depth": spike,
                    "pathogen_reads": n_pathogen,
                    "total_reads": n_total,
                    "mode": mode,
                    "detected": PATHOGEN in est,
                    "est_pct": round(est.get(PATHOGEN, 0.0), 4),
                    "false_pos": len(fp),
                    "n_called": len(est),
                }
                rows.append(r)
                print(json.dumps(r), flush=True)
        if args.json:
            with open(args.json, "w") as f:
                json.dump(rows, f, indent=1)
        print("\n| spike | pathogen reads | mode 0 | mode 1 | mode 3 |",
              file=sys.stderr)
        print("|---|---|---|---|---|", file=sys.stderr)
        by = {(r["spike_depth"], r["mode"]): r for r in rows}
        for spike in SPIKES:
            cells = []
            for m in MODES:
                r = by[(spike, m)]
                cells.append(
                    f"{'DETECTED' if r['detected'] else 'missed'}"
                    f" ({r['est_pct']}%)" if r["detected"] else "missed"
                )
            pr = by[(spike, MODES[0])]["pathogen_reads"]
            print(
                f"| {spike:g} | {pr} | " + " | ".join(cells) + " |",
                file=sys.stderr,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
