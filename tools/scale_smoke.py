"""Mid-scale pipeline smoke run: N synthetic genomes end-to-end.

Not part of the test suite (minutes-long); run manually:
    python tools/scale_smoke.py [n_genomes] [genome_mb]
Reports compute/index wall times, DB size, and host-backend search
throughput against the built database.
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    n_genomes = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    genome_mb = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    work = "/tmp/kmcp_scale_smoke"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    from kmcp_tpu.commands.compute import ComputeOptions, run_compute
    from kmcp_tpu.index.build import run_index
    from kmcp_tpu.search.engine import SearchEngine, SearchOptions
    from kmcp_tpu.search.stream import StreamSearcher

    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    glen = int(genome_mb * 1e6)
    print(f"[scale] generating {n_genomes} x {genome_mb} Mb genomes ...")
    t0 = time.time()
    genomes = []
    paths = []
    for g in range(n_genomes):
        seq = rng.choice(bases, size=glen).tobytes()
        p = os.path.join(work, f"g{g:04d}.fa")
        with open(p, "w") as f:
            f.write(f">g{g:04d}\n{seq.decode()}\n")
        genomes.append(seq)
        paths.append(p)
    print(f"[scale] generated in {time.time()-t0:.1f}s")

    t0 = time.time()
    run_compute(
        out_dir=os.path.join(work, "ks"),
        files=paths,
        opt=ComputeOptions(ks=[21], split_number=10, split_overlap=20),
        force=True,
    )
    t_compute = time.time() - t0
    t0 = time.time()
    run_index(
        in_dir=os.path.join(work, "ks"), out_dir=os.path.join(work, "db"),
        num_hashes=1, fpr=0.3, force=True, tpu_native=True,
    )
    t_index = time.time() - t0
    db_bytes = sum(
        os.path.getsize(os.path.join(work, "db", f))
        for f in os.listdir(os.path.join(work, "db"))
    )

    n_reads = 100_000
    reads = []
    for i in range(n_reads):
        g = genomes[int(rng.integers(0, n_genomes))]
        p = int(rng.integers(0, glen - 150))
        reads.append(g[p : p + 150])
    qs = [(f"r{i}", s, None) for i, s in enumerate(reads)]

    eng = SearchEngine(
        [os.path.join(work, "db")],
        SearchOptions(backend="host", batch_size=32768),
    )
    st = StreamSearcher(eng)
    out = open(os.devnull, "w")
    st.run(iter(qs[:32768]), out)
    t0 = time.time()
    total, matched = st.run(iter(qs), out)
    t_search = time.time() - t0

    total_bp = n_genomes * glen
    print(
        f"[scale] {n_genomes} genomes ({total_bp/1e6:.0f} Mbp), "
        f"{n_genomes*10} targets"
    )
    print(f"[scale] compute: {t_compute:.1f}s ({total_bp/1e6/t_compute:.0f} Mbp/s)")
    print(f"[scale] index:   {t_index:.1f}s, db {db_bytes/1e6:.0f} MB")
    print(
        f"[scale] search (host backend): {total} reads in {t_search:.2f}s "
        f"= {total/t_search:,.0f} reads/s ({matched/total*100:.1f}% matched)"
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
