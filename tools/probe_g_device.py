"""Real-chip A/B: whole-genome containment queries (`search -g`) on the
jax backend (chunked k-mer-axis accumulation,
kernel.make_jax_counter_genome) vs host/numpy — byte parity + timing
(round-5 item; /root/reference/kmcp/cmd/search.go:885-937).
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    db = os.path.join(ROOT, ".bench", "demo-k21-n10.native.db")
    query = "/root/reference/demo-profiling/refs/GCF_003697165.2.fa.gz"
    import tempfile

    d = tempfile.mkdtemp(prefix="g_ab_")
    outs = {}
    for backend in ("host", "numpy", "jax"):
        out = os.path.join(d, f"g.{backend}.tsv")
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bin", "kmcp-tpu"),
             "-q", "search", "-d", db, "-g", "--backend", backend,
             "-t", "0.4", query, "-o", out],
            capture_output=True, text=True, timeout=900,
        )
        dt = time.time() - t0
        if r.returncode != 0:
            print(f"[g-ab] {backend}: FAILED\n{r.stderr[-600:]}",
                  file=sys.stderr)
            continue
        outs[backend] = open(out).read()
        print(f"[g-ab] {backend}: {dt:.2f} s", file=sys.stderr)
    if len(outs) == 3:
        same = outs["host"] == outs["jax"] == outs["numpy"]
        print(f"[g-ab] TSVs byte-identical (3 backends): {same}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
