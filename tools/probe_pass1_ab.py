"""Interleaved A/B of screened pass-1 gather variants and U-build
variants on the real chip (round-5).  Interleaving cancels tunnel
drift that makes session-to-session stage timings non-comparable.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from kmcp_tpu.search.device import (
        DeviceDB, _build_u_digit, _union_gather, enable_compilation_cache,
    )
    from kmcp_tpu.search.device_step import _unpack_count
    from kmcp_tpu.search.engine import SearchEngine, SearchOptions

    enable_compilation_cache()
    B, K = 4096, 140
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench", "large_t-131072")
    eng = SearchEngine(
        [os.path.join(root, "db-uniform")],
        SearchOptions(backend="jax", batch_size=B),
    )
    dev = DeviceDB(eng.dbs[0], SearchOptions(backend="jax", batch_size=B))
    nb = dev.n_blocks
    u_sect = dev.screen["u_sect"]
    NU = dev.screen["u_rows"] - 1
    rng = np.random.default_rng(0)
    locu_np = rng.integers(0, NU, size=(K, B)).astype(np.int32)
    locu = jax.device_put(locu_np)
    locus = [locu, jnp.roll(locu, 1, 1), jnp.roll(locu, 2, 1)]
    u_flat = u_sect.reshape(-1)[: NU + 1].reshape(NU + 1, 1)
    jax.block_until_ready((locus, u_flat))

    @jax.jit
    def p1_rowgather(locu):
        urows = jnp.take(u_flat, locu, axis=0)
        return _unpack_count(urows)[:, :nb]

    @jax.jit
    def p1_sector(locu):
        urows = _union_gather(u_sect, locu, 1)
        return _unpack_count(urows)[:, :nb]

    @jax.jit
    def p1_gather_only(locu):
        return jnp.take(u_sect, locu // 32, axis=0).sum(
            axis=(0, 2), dtype=jnp.uint32
        )

    S_pad = 3584
    loc_bk = jax.device_put(
        rng.integers(0, S_pad - 6, size=(B, K)).astype(np.int32)
    )

    @jax.jit
    def u_digit(l):
        return _build_u_digit(l, S_pad)

    @jax.jit
    def u_digit64(l):
        # symmetric 64x64 digits at S_pad 4096 (M=N=64 on the MXU)
        S2 = 4096
        hi = (l // 64).astype(jnp.int32)
        lo = (l % 64).astype(jnp.int32)
        eh = (
            hi[:, None, :] == jnp.arange(64, dtype=jnp.int32)[None, :, None]
        ).astype(jnp.bfloat16)
        el = (
            lo[:, :, None] == jnp.arange(64, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.bfloat16)
        u = jax.lax.dot_general(
            eh, el, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return u.reshape(l.shape[0], S2).astype(jnp.bfloat16)

    @jax.jit
    def u_scatter(l):
        u = jnp.zeros((B, S_pad), jnp.int32)
        return u.at[jnp.arange(B)[:, None], l].add(1, mode="drop")

    variants = [
        ("p1 row-gather [NU+1,1]", p1_rowgather, locus),
        ("p1 sector+select", p1_sector, locus),
        ("p1 sector gather only", p1_gather_only, locus),
        ("U digit 64x56", u_digit, [loc_bk]),
        ("U digit 64x64", u_digit64, [loc_bk]),
        ("U scatter", u_scatter, [loc_bk]),
    ]
    # warm all
    for name, fn, args in variants:
        jax.block_until_ready(fn(args[0]))
    # interleaved rounds
    times = {name: [] for name, _, _ in variants}
    for rnd in range(6):
        for name, fn, args in variants:
            t0 = time.time()
            for i in range(4):
                r = fn(args[i % len(args)])
            np.asarray(r)[:1]
            times[name].append((time.time() - t0) / 4)
    for name, _, _ in variants:
        ts = sorted(times[name])
        print(f"[ab] {name}: best {ts[0]*1e3:.2f} ms  "
              f"median {ts[len(ts)//2]*1e3:.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
