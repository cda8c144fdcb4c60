"""Round-5 item 9: an honest device-side index-build experiment.

The reference builds Bloom blocks by scattering k-mer bits into byte
columns (/root/reference/kmcp/cmd/index.go:1107-1259); our host
word-column build runs ~140 MB/s of output bits on 4 cores.  This
probe measures the TPU alternative at one tpu-native block's shape
(4096 targets x s_block rows):

  1. host oracle build (native word-column path) — rate
  2. device scatter build: per 32-target word group, boolean scatters
     OR into the packed [S, W] matrix — ON-CHIP step rate (chained
     dispatch barrier)
  3. the tunnel terms a real build would pay: H2D of the k-mer hashes
     and D2H of the finished block

The decision needs all three: on this tunnel the hash upload alone
(8 B/k-mer at ~45 MB/s) dwarfs the host's whole build, so the device
path only makes sense for device-RESIDENT indexes (skip the D2H and
search immediately) or PCIe-attached hosts.  Numbers go to
docs/PERF.md / ROADMAP item 8.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from kmcp_tpu.search.device import enable_compilation_cache

    enable_compilation_cache()
    T, per_t = 4096, 1000
    rng = np.random.default_rng(0)
    S = 3584
    W = T // 32
    # synthetic per-target k-mer row lists (the compute stage's output
    # after `hash mod S`)
    loc = rng.integers(0, S, size=(T, per_t)).astype(np.int32)

    # ---- 1. host word-column oracle
    t0 = time.time()
    bits_host = np.zeros((S, W), np.uint32)
    for t in range(T):
        w, b = t // 32, np.uint32(1 << (t % 32))
        np.bitwise_or.at(bits_host[:, w], loc[t], b)
    dt_host = time.time() - t0
    out_mb = S * W * 4 / 1e6
    print(f"[build-ab] host numpy scatter: {dt_host:.2f} s "
          f"({out_mb/dt_host:.1f} MB/s out, "
          f"{T*per_t/dt_host/1e6:.1f} M kmers/s)", file=sys.stderr)

    # ---- 2. device scatter build
    @jax.jit
    def build_dev(loc):
        def word(w):
            col = jnp.zeros((S,), jnp.uint32)
            for j in range(32):
                m = jnp.zeros((S,), bool).at[loc[w * 32 + j]].set(True)
                col = col | (m.astype(jnp.uint32) << j)
            return col

        return jnp.stack([word(w) for w in range(W)], axis=1)

    loc_t = jax.device_put(loc)
    locs = [loc_t, jnp.roll(loc_t, 1, 0), jnp.roll(loc_t, 2, 0)]
    jax.block_until_ready(locs)
    r = build_dev(locs[0])
    jax.block_until_ready(r)
    best = None
    for _ in range(2):
        t0 = time.time()
        for i in range(4):
            r = build_dev(locs[i % 3])
        np.asarray(r[:1, :1])
        dt = (time.time() - t0) / 4
        best = dt if best is None else min(best, dt)
    print(f"[build-ab] device scatter step: {best:.3f} s "
          f"({out_mb/best:.1f} MB/s out, "
          f"{T*per_t/best/1e6:.1f} M kmers/s on-chip)", file=sys.stderr)

    # correctness
    dev_bits = np.asarray(r)
    ok = np.array_equal(dev_bits, bits_host)
    print(f"[build-ab] device == host bits: {ok}", file=sys.stderr)

    # ---- 3. tunnel terms
    t0 = time.time()
    h = jax.block_until_ready(
        jax.device_put(rng.integers(0, 2**63, size=T * per_t)
                       .astype(np.uint64))
    )
    h2d = T * per_t * 8 / (time.time() - t0) / 1e6
    t0 = time.time()
    _ = np.asarray(r)
    d2h = out_mb / (time.time() - t0)
    print(f"[build-ab] tunnel: hashes H2D {h2d:.1f} MB/s "
          f"({T*per_t*8/1e6:.0f} MB/block), block D2H {d2h:.1f} MB/s "
          f"({out_mb:.0f} MB/block)", file=sys.stderr)
    total_dev = T * per_t * 8 / 1e6 / max(h2d, 1e-9) + best + \
        out_mb / max(d2h, 1e-9)
    print(f"[build-ab] device e2e/block ~{total_dev:.2f} s vs host "
          f"{dt_host:.2f} s (numpy oracle; the native builder is "
          f"faster still)", file=sys.stderr)


if __name__ == "__main__":
    main()
