"""Probe 2: U-build variants + a prototype grouped-GEMM pass-2 kernel.

Stage-B design probe for the round-5 MXU count path (see
probe_mxu_count.py).  Measures on the real chip:
  1. U [B, S] build: XLA scatter vs compare-iota chunks vs digit-GEMM
     (two 64-ary digits; U = batched [64, K] @ [K, 64] one-hot product)
  2. prototype Pallas grouped GEMM: counts u16 [P_pad, 4096] from
     per-pair U rows (bf16) x per-block bit slabs (u8 -> bf16 in VMEM)
  3. exactness of both vs a numpy oracle
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kmcp_tpu.search.device import enable_compilation_cache

    enable_compilation_cache()
    B = int(os.environ.get("PROBE_B", "4096"))
    S = 3584  # padded block modulus (3578 rounded to sublanes)
    NB = int(os.environ.get("PROBE_NB", "32"))
    T_b = 4096
    K = 130
    P_t = 128
    T_t = int(os.environ.get("PROBE_TT", "512"))
    # ~1.3 active blocks/read plus per-block tile padding
    P_pad = (int(B * 1.4) + NB * P_t + P_t - 1) // P_t * P_t
    reps = int(os.environ.get("PROBE_REPS", "8"))
    rng = np.random.default_rng(0)

    print(f"[probe2] B={B} S={S} NB={NB} P_pad={P_pad} T_t={T_t}",
          file=sys.stderr)
    print(f"[probe2] device: {jax.devices()[0]}", file=sys.stderr)

    loc_np = rng.integers(0, S - 6, size=(B, K)).astype(np.int32)
    loc_t = jax.device_put(loc_np)
    loc_ts = [loc_t, jnp.roll(loc_t, 1, 0), jnp.roll(loc_t, 2, 0)]
    jax.block_until_ready(loc_ts)

    def timeit(name, fn, args_list, pull):
        r = fn(*args_list[0])
        jax.block_until_ready(pull(r))
        best = None
        for _ in range(2):
            t0 = time.time()
            for i in range(reps):
                r = fn(*args_list[i % len(args_list)])
            np.asarray(pull(r))
            dt = (time.time() - t0) / reps
            best = dt if best is None else min(best, dt)
        print(f"[probe2] {name}: {best*1e3:.2f} ms", file=sys.stderr)
        return best

    # ---- 1a. scatter U (baseline)
    @jax.jit
    def u_scatter(loc):
        u = jnp.zeros((B, S), jnp.int32)
        return u.at[jnp.arange(B)[:, None], loc].add(1, mode="drop")

    timeit("U scatter int32", u_scatter, [(l,) for l in loc_ts],
           lambda r: r[:1, :1])

    # ---- 1b. compare-iota in S-chunks
    @jax.jit
    def u_iota(loc):
        outs = []
        CH = 512
        for s0 in range(0, S, CH):
            eq = loc[:, :, None] == jnp.arange(
                s0, s0 + CH, dtype=jnp.int32
            )[None, None, :]
            outs.append(eq.sum(axis=1, dtype=jnp.int32))
        return jnp.concatenate(outs, axis=1)

    timeit("U compare-iota", u_iota, [(l,) for l in loc_ts],
           lambda r: r[:1, :1])

    # ---- 1c. digit-GEMM: S = 64*56; U[b, hi*56+lo] via [64,K]@[K,56]
    DL = 56  # S // 64
    assert S == 64 * DL

    @jax.jit
    def u_digit(loc):
        hi = (loc // DL).astype(jnp.int32)  # [B, K] in 0..63
        lo = (loc % DL).astype(jnp.int32)
        eh = (
            hi[:, None, :] == jnp.arange(64, dtype=jnp.int32)[None, :, None]
        ).astype(jnp.bfloat16)  # [B, 64, K]
        el = (
            lo[:, :, None] == jnp.arange(DL, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.bfloat16)  # [B, K, DL]
        u = jax.lax.dot_general(
            eh, el, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [B, 64, DL]
        return u.reshape(B, S)

    t_dig = timeit("U digit-GEMM bf16", u_digit, [(l,) for l in loc_ts],
                   lambda r: r[:1, :1])

    # exactness of the builds
    u_ref = np.zeros((B, S), np.int32)
    np.add.at(u_ref, (np.arange(B)[:, None], loc_np), 1)
    for name, fn in (("scatter", u_scatter), ("iota", u_iota),
                     ("digit", u_digit)):
        got = np.asarray(fn(loc_t)[:256]).astype(np.int32)
        print(f"[probe2] U {name} exact: "
              f"{np.array_equal(got, u_ref[:256])}", file=sys.stderr)

    # ---- 2. prototype grouped GEMM kernel
    @jax.jit
    def make_bits(_):
        key = jax.random.PRNGKey(3)
        return (
            jax.random.uniform(key, (NB, S, T_b), jnp.float32) < 0.3
        ).astype(jnp.int8)

    bits8 = make_bits(0)
    jax.block_until_ready(bits8)

    # block-sorted pair layout: contiguous groups padded to P_t
    n_real = int(B * 1.3)
    pb_np = rng.integers(0, B, size=n_real).astype(np.int32)
    pg_np = np.sort(rng.integers(0, NB, size=n_real).astype(np.int32))
    # tile block ids + per-pair U row gather
    blk_tile = np.full((P_pad // P_t,), NB, np.int32)
    u_rows = np.full((P_pad,), 0, np.int32)
    valid = np.zeros((P_pad,), bool)
    pos = 0
    for g in range(NB):
        sel = np.nonzero(pg_np == g)[0]
        if not len(sel):
            continue
        for i in sel:
            if pos // P_t < len(blk_tile):
                blk_tile[pos // P_t] = g
                u_rows[pos] = pb_np[i]
                valid[pos] = True
            pos += 1
        pos = -(-pos // P_t) * P_t  # next block starts on a tile boundary
    print(f"[probe2] real pairs {n_real}, padded slots {pos}",
          file=sys.stderr)

    u_all = u_digit(loc_t).astype(jnp.bfloat16)
    u_rows_t = jax.device_put(u_rows)
    valid_t = jax.device_put(valid)

    @jax.jit
    def gather_u(u, rows, val):
        return jnp.where(
            val[:, None], jnp.take(u, rows, axis=0), jnp.bfloat16(0)
        )

    u_p = gather_u(u_all, u_rows_t, valid_t)
    blk_t = jax.device_put(blk_tile)
    jax.block_until_ready((u_p, blk_t))

    @functools.lru_cache(maxsize=None)
    def make_group_gemm():
        def kernel(blk_ref, u_ref, bits_ref, out_ref, slab, slab_bf, sem):
            ti = pl.program_id(1)
            pi = pl.program_id(0)
            g = blk_ref[pi]

            @pl.when(g < NB)
            def _():
                cp = pltpu.make_async_copy(
                    bits_ref.at[g, :, pl.ds(ti * T_t, T_t)], slab, sem
                )
                cp.start()
                cp.wait()
                slab_bf[...] = slab[...].astype(jnp.bfloat16)
                out_ref[...] = jnp.dot(
                    u_ref[...], slab_bf[...],
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)

            @pl.when(g >= NB)
            def _():
                out_ref[...] = jnp.zeros((P_t, T_t), jnp.int32)

        @jax.jit
        def run(bits8, u_p, blk):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((P_pad, T_b), jnp.int32),
                grid=(P_pad // P_t, T_b // T_t),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(
                        (P_t, S), lambda p, t: (p, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (P_t, T_t), lambda p, t: (p, t),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((S, T_t), jnp.int8),
                    pltpu.VMEM((S, T_t), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA,
                ],
            )(blk, u_p, bits8)

        return run

    try:
        gg = make_group_gemm()
        u_ps = [u_p, jnp.roll(u_p, 1, 0), jnp.roll(u_p, 2, 0)]
        jax.block_until_ready(u_ps)
        t_gg = timeit("grouped GEMM pass-2", gg,
                      [(bits8, u, blk_t) for u in u_ps],
                      lambda r: r[:1, :1])
        # exactness on a slice: first 4 tiles
        got = np.asarray(gg(bits8, u_p, blk_t)[: 4 * P_t]).astype(np.int64)
        bits_np_sl = np.asarray(bits8[:, :, :]).astype(np.int64)
        ref = np.zeros_like(got)
        for p in range(4 * P_t):
            g = blk_tile[p // P_t]
            if g < NB and valid[p]:
                ref[p] = u_ref[u_rows[p]].astype(np.int64) @ bits_np_sl[g]
        print(f"[probe2] grouped GEMM exact on 4 tiles: "
              f"{np.array_equal(got, ref)}", file=sys.stderr)
        print(f"[probe2] projected pass-2 total (U digit + gather + GEMM):"
              f" {(t_dig + t_gg)*1e3:.2f} ms for B={B}"
              f" -> {B/(t_dig+t_gg)/1e3:.0f}k reads/s (excl. pass 1)",
              file=sys.stderr)
    except Exception as e:
        import traceback
        traceback.print_exc()
        print(f"[probe2] grouped GEMM failed: {str(e)[:500]}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
