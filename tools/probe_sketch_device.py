"""Real-chip A/B: sketch queries (minimizer / closed syncmer) on the
device streaming path vs the host backend — byte parity + throughput
(round-5 item: sketch selection on device, sketch_device.py).
Builds small sketch DBs under .bench/sketch-<kind>/ on first use.
"""

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench"
)


def build_db(kind: str) -> tuple[str, list[bytes]]:
    from kmcp_tpu.commands.compute import ComputeOptions, run_compute
    from kmcp_tpu.index.build import run_index
    from kmcp_tpu.seqio.fastx import read_fastx

    root = os.path.join(CACHE, f"sketch-{kind}")
    db = os.path.join(root, "db")
    gdir = os.path.join(root, "genomes")
    os.makedirs(gdir, exist_ok=True)
    rng = np.random.default_rng(17)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genomes = []
    files = []
    for g in range(24):
        path = os.path.join(gdir, f"g{g:02d}.fa")
        files.append(path)
        if os.path.isfile(path):
            genomes.append(
                b"".join(r.seq for r in read_fastx(path))
            )
            rng.choice(bases, size=400_000)
        else:
            seq = rng.choice(bases, size=400_000).tobytes()
            with open(path, "w") as f:
                f.write(f">g{g:02d}\n{seq.decode()}\n")
            genomes.append(seq)
    if not os.path.isfile(os.path.join(db, "db.json")):
        skw = (
            dict(minimizer_w=5) if kind == "minimizer"
            else dict(syncmer_s=11)
        )
        run_compute(
            out_dir=os.path.join(root, "ks"), files=files,
            opt=ComputeOptions(ks=[21], split_number=4,
                               split_overlap=100, **skw),
            force=True,
        )
        run_index(
            in_dir=os.path.join(root, "ks"), out_dir=db, num_hashes=1,
            fpr=0.3, force=True, tpu_native=True,
        )
    return db, genomes


def main():
    from kmcp_tpu.search.device import enable_compilation_cache
    from kmcp_tpu.search.engine import SearchEngine, SearchOptions
    from kmcp_tpu.search.stream import StreamSearcher

    enable_compilation_cache()
    n = int(os.environ.get("PROBE_READS", "40000"))
    rng = np.random.default_rng(5)
    for kind in ("minimizer", "syncmer"):
        db, genomes = build_db(kind)
        reads = []
        for i in range(n):
            g = genomes[int(rng.integers(0, len(genomes)))]
            p = int(rng.integers(0, len(g) - 150))
            reads.append((f"r{i}", g[p : p + 150], None))
        outs = {}
        rates = {}
        for backend in ("host", "jax"):
            opt = SearchOptions(backend=backend, batch_size=8192)
            eng = SearchEngine([db], opt)
            if not StreamSearcher.usable(eng):
                print(f"[sketch-ab] {kind}/{backend}: not streamable",
                      file=sys.stderr)
                outs[backend] = None
                continue
            st = StreamSearcher(eng)
            buf = io.StringIO()
            st.run(iter(reads[:8192]), io.StringIO())  # warm
            best = None
            for _ in range(2):
                buf = io.StringIO()
                t0 = time.time()
                st.run(iter(reads), buf)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            outs[backend] = buf.getvalue()
            rates[backend] = round(n / best, 1)
        same = (
            outs["host"] is not None and outs["jax"] is not None
            and outs["host"] == outs["jax"]
        )
        print(
            f"[sketch-ab] {kind}: byte-identical={same} "
            f"host={rates.get('host')} jax={rates.get('jax')} reads/s",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
