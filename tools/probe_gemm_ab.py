"""Interleaved A/B: screened step with pair-kernel pass-2 vs
grouped-GEMM pass-2, one process, alternating rounds (cancels tunnel
drift).  Also asserts both modes return identical candidates.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from kmcp_tpu.kmer import native
    from kmcp_tpu.search.device import DeviceDB, enable_compilation_cache
    from kmcp_tpu.search.engine import SearchEngine, SearchOptions
    from tools.bench_large_t import make_reads

    enable_compilation_cache()
    B = int(os.environ.get("PROBE_B", "4096"))
    tgt = os.environ.get("PROBE_T", "131072")
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench", f"large_t-{tgt}")
    eng = SearchEngine(
        [os.path.join(root, "db-uniform")],
        SearchOptions(backend="jax", batch_size=B),
    )
    opt = SearchOptions(backend="jax", batch_size=B)
    dev = DeviceDB(eng.dbs[0], opt)
    reads = make_reads(os.path.join(root, "genomes"), 4 * B, 10.0)
    budget = B + B // 2

    def prep(lo):
        seqs = [r[1] for r in reads[lo : lo + B]]
        lens = np.array([len(s) for s in seqs], dtype=np.int64)
        lmax = max(-(-int(lens.max()) // 32) * 32, 21 + 31)
        return (
            jax.device_put(native.pack_rows_4bit(seqs, lens, lmax)),
            jax.device_put(lens.astype(np.int32)),
        )

    batches = [prep(i * B) for i in range(4)]
    jax.block_until_ready(batches)

    def run_mode(mode, mat, lens):
        os.environ["KMCP_TPU_GEMM_PAIR"] = "1" if mode == "gemm" else "0"
        return dev.search_reads_pallas(mat, lens, budget, packed4=True)

    # warm + parity check
    for mode in ("pair", "gemm"):
        m, a = run_mode(mode, *batches[0])
        jax.block_until_ready((m, a))
    rp = run_mode("pair", *batches[1])
    rg = run_mode("gemm", *batches[1])
    mp, ap = [np.asarray(x) for x in rp]
    mg, ag = [np.asarray(x) for x in rg]
    n = int(mp[0])
    assert n == int(mg[0]), (n, int(mg[0]))
    np.testing.assert_array_equal(mp[1 : 1 + n], mg[1 : 1 + n])
    np.testing.assert_array_equal(
        mp[1 + budget : 1 + budget + n], mg[1 + budget : 1 + budget + n]
    )
    np.testing.assert_array_equal(ap, ag)
    print(f"[ab2] parity OK, {n} candidates", file=sys.stderr)

    times = {"pair": [], "gemm": []}
    for rnd in range(6):
        for mode in ("pair", "gemm"):
            t0 = time.time()
            m = None
            for i in range(6):
                m, _ = run_mode(mode, *batches[i % 4])
            np.asarray(m[:1])
            times[mode].append((time.time() - t0) / 6)
    for mode in ("pair", "gemm"):
        ts = sorted(times[mode])
        best, med = ts[0], ts[len(ts) // 2]
        print(f"[ab2] {mode}: best {best*1e3:.2f} ms ({B/best/1e3:.1f}k "
              f"reads/s)  median {med*1e3:.2f} ms ({B/med/1e3:.1f}k)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
