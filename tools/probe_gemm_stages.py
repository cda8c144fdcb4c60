"""Stage-by-stage timing of the grouped-GEMM screened step on the real
chip (round-5 optimization probe): hash kernel, pass-1 screen, pair
sort/pad, U build, U gather, grouped GEMM, thresholds+mask, word scan.
Uses the cached 131k-target uniform DB and bench-shaped reads.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from kmcp_tpu.kmer import native
    from kmcp_tpu.search.device import (
        DeviceDB, _build_u_digit, _gemm_geometry, enable_compilation_cache,
    )
    from kmcp_tpu.search.device_step import _nonzero_asc, _unpack_count
    from kmcp_tpu.search.engine import SearchEngine, SearchOptions
    from kmcp_tpu.search.pallas_count import make_pallas_group_count
    from kmcp_tpu.search.pallas_hash import make_pallas_hash_loc
    from tools.bench_large_t import make_reads

    enable_compilation_cache()
    B = int(os.environ.get("PROBE_B", "4096"))
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench", "large_t-131072")
    db_dir = os.path.join(root, "db-uniform")
    gdir = os.path.join(root, "genomes")
    reads = make_reads(gdir, B, 10.0)

    opt = SearchOptions(backend="jax", batch_size=B)
    eng = SearchEngine([db_dir], opt)
    dev = DeviceDB(eng.dbs[0], opt)
    screen = dev.screen
    s_block = screen["s_block"]
    nb = dev.n_blocks
    t_block = dev.t_per_block
    k = 21
    seqs = [r[1] for r in reads[:B]]
    lens_np = np.array([len(s) for s in seqs], dtype=np.int64)
    lmax = max(-(-int(lens_np.max()) // 32) * 32, k + 31)
    mat = native.pack_rows_4bit(seqs, lens_np, lmax)
    K = lmax - k + 1
    cand_budget = B + B // 2
    pair_budget = min(B * nb, max(256, 2 * cand_budget))
    S_pad, T_t = _gemm_geometry(s_block, t_block)
    gm_P_t = 128
    gm_P_pad = -(-(pair_budget + nb * gm_P_t) // gm_P_t) * gm_P_t
    print(f"[stages] B={B} K={K} s_block={s_block} nb={nb} "
          f"pair_budget={pair_budget} P_pad={gm_P_pad} S_pad={S_pad} "
          f"T_t={T_t}", file=sys.stderr)

    hash_fn = make_pallas_hash_loc(
        k, lmax, s_block, (1 << 64) - 1, num_hashes=1,
        screen_sigs=screen["num_bits"], packed4=True,
    )
    mat_t = jax.device_put(mat)
    lens_t = jax.device_put(lens_np.astype(np.int32))
    mats = [mat_t, jnp.roll(mat_t, 1, 0), jnp.roll(mat_t, 2, 0)]
    jax.block_until_ready(mats)

    def timeit(name, fn, args_list, pull, reps=8):
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
        print(f"[stages] {name}: {best*1e3:.2f} ms", file=sys.stderr)
        return best, r

    t_hash, outs = timeit("1 hash kernel", hash_fn,
                          [(m,) for m in mats], lambda r: r[0][:1, :1])
    loc_t, locu_t, nk = outs[:3]
    nkmers = nk[0]
    u_ext = screen["u_ext"]
    theta_tab = dev._theta_for(max(K, 1))
    cmin = dev.cmin_for(max(K, 1))
    tmin, sizes_pos = dev._tmin, dev.sizes_pos

    @jax.jit
    def pass1(locu_t, nkmers, lens):
        urows = jnp.take(u_ext, locu_t, axis=0)
        ucnt = _unpack_count(urows)[:, :nb]
        theta = jnp.take(
            theta_tab, jnp.minimum(nkmers, theta_tab.shape[1] - 1), axis=1
        ).T
        read_ok = (lens >= 30) & (nkmers <= 256)
        active = (ucnt >= theta) & read_ok[:, None]
        pairs, n_pairs = _nonzero_asc(
            active.reshape(-1), pair_budget, B * nb
        )
        return pairs, n_pairs

    t_p1, (pairs, n_pairs) = timeit(
        "2 pass-1 screen", pass1,
        [(locu_t, nkmers, lens_t)], lambda r: r[0][:1],
    )
    print(f"[stages]   n_pairs = {int(n_pairs)}", file=sys.stderr)

    @jax.jit
    def sortpad(pairs):
        pv = pairs < B * nb
        pidx = jnp.minimum(pairs, B * nb - 1)
        pb = pidx // nb
        pg = pidx % nb
        key = jnp.where(pv, pg, jnp.int32(nb))
        order = jnp.argsort(key)
        rank = jnp.argsort(order)
        pb_s = jnp.take(pb, order)
        pg_s = jnp.take(key, order)
        gids = jnp.arange(nb, dtype=jnp.int32)
        cnt = (pg_s[None, :] == gids[:, None]).sum(axis=1, dtype=jnp.int32)
        start = jnp.cumsum(cnt) - cnt
        padded = -(-cnt // gm_P_t) * gm_P_t
        pbase = jnp.cumsum(padded) - padded
        gsafe = jnp.minimum(pg_s, nb - 1)
        slot_s = jnp.where(
            pg_s < nb,
            jnp.take(pbase, gsafe)
            + jnp.arange(pair_budget, dtype=jnp.int32)
            - jnp.take(start, gsafe),
            jnp.int32(gm_P_pad),
        )
        pb_pad = (
            jnp.full((gm_P_pad,), B, jnp.int32)
            .at[slot_s].set(pb_s, mode="drop")
        )
        pg_pad = (
            jnp.full((gm_P_pad,), nb, jnp.int32)
            .at[slot_s].set(pg_s, mode="drop")
        )
        blk_tile = pg_pad.reshape(-1, gm_P_t).min(axis=1)
        slot_rm = jnp.take(slot_s, rank)
        return pb, pg, pb_pad, pg_pad, blk_tile, slot_rm

    t_sp, sp = timeit("3 sort/pad", sortpad, [(pairs,)],
                      lambda r: r[2][:1])
    pb, pg, pb_pad, pg_pad, blk_tile, slot_rm = sp

    loc_bk = loc_t.T
    t_u, u_all = timeit(
        "4 U digit build", lambda l: _build_u_digit(l, S_pad),
        [(loc_bk,)], lambda r: r[:1, :1],
    )

    @jax.jit
    def gather_u(u_all, pb_pad):
        valid = pb_pad < B
        return jnp.where(
            valid[:, None],
            jnp.take(u_all, jnp.minimum(pb_pad, B - 1), axis=0),
            jnp.bfloat16(0),
        )

    t_ug, u_p = timeit("5 U gather", gather_u, [(u_all, pb_pad)],
                       lambda r: r[:1, :1])

    bits8 = dev._gemm_slabs(S_pad)
    jax.block_until_ready(bits8)
    gemm_fn = make_pallas_group_count(S_pad, nb, t_block, T_t)
    u_ps = [u_p, jnp.roll(u_p, 1, 0), jnp.roll(u_p, 2, 0)]
    jax.block_until_ready(u_ps)
    t_gg, counts_p = timeit(
        "6 grouped GEMM", lambda u: gemm_fn(bits8, u, blk_tile),
        [(u,) for u in u_ps], lambda r: r[:1, :1],
    )

    @jax.jit
    def maskpass(counts_p, pb_pad, pg_pad, nkmers):
        valid = pb_pad < B
        c_thresh = jnp.take(cmin, jnp.minimum(nkmers, cmin.shape[0] - 1))
        cthr_pad = jnp.where(
            valid, jnp.take(c_thresh, jnp.minimum(pb_pad, B - 1)),
            jnp.int32(2**30),
        )
        tmin2 = tmin.reshape(nb, t_block)
        spos2 = sizes_pos.reshape(nb, t_block)
        gp = jnp.minimum(pg_pad, nb - 1)
        okm = (
            (counts_p >= cthr_pad[:, None])
            & (counts_p >= jnp.take(tmin2, gp, axis=0))
            & jnp.take(spos2, gp, axis=0)
        )
        jb = jnp.arange(32, dtype=jnp.uint32)
        mask_pad = (
            okm.reshape(gm_P_pad, t_block // 32, 32).astype(jnp.uint32)
            << jb[None, None, :]
        ).sum(axis=-1, dtype=jnp.uint32)
        return mask_pad

    t_mask, mask_pad = timeit(
        "7 thresholds+mask", maskpass,
        [(counts_p, pb_pad, pg_pad, nkmers)], lambda r: r[:1, :1],
    )

    W_b = t_block // 32

    @jax.jit
    def scan(mask_pad, slot_rm, counts_p, pb, pg):
        mask_rm = jnp.where(
            (slot_rm < gm_P_pad)[:, None],
            jnp.take(mask_pad, jnp.minimum(slot_rm, gm_P_pad - 1), axis=0),
            jnp.uint32(0),
        )
        total = lax.population_count(mask_rm).astype(jnp.int32).sum()
        nw_total = pair_budget * W_b
        wid, _nw = _nonzero_asc(
            (mask_rm != 0).reshape(-1), cand_budget, nw_total
        )
        wv = jnp.where(
            wid < nw_total,
            jnp.take(mask_rm.reshape(-1), jnp.minimum(wid, nw_total - 1)),
            jnp.uint32(0),
        )
        return total, wid, wv

    t_scan, _ = timeit(
        "8 word scan", scan,
        [(mask_pad, slot_rm, counts_p, pb, pg)], lambda r: r[1][:1],
    )

    tot = t_hash + t_p1 + t_sp + t_u + t_ug + t_gg + t_mask + t_scan
    print(f"[stages] total {tot*1e3:.2f} ms -> {B/tot/1e3:.1f}k reads/s "
          f"(stage-sum; real step fuses several)", file=sys.stderr)


if __name__ == "__main__":
    main()
