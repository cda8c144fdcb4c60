"""The two-pass screened device search: pass 1 counts a packed
per-block union screen (one 32-block word per k-mer), pass 2 gathers
only each read's active blocks through the block-stationary Mosaic pair
kernel (`pallas_count`).  This is the wide-target-count regime — the
device analog of `index --block-screen` union screens
(/root/reference/kmcp/cmd/util-db-search.go:939-964 fans queries to
block indices; here the screen prunes the fan-out on chip).

Split out of device.py (round 5) purely for reviewability; all names
re-export through `kmcp_tpu.search.device` — no behavior change.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from .device_step import (
    _csa,
    _unpack_count,
    _unpack_sum,
    _dedup_value_planes,
    _merge_segments,
    _nonzero_asc,
)

def _screen_geometry(db):
    """Shared union num_bits when a multi-block DB can run the device
    two-pass screened search, else None: single-hash, every block
    carries a union screen (index --block-screen) of one shared size,
    and the blocks share a Bloom ROW count so one location plane serves
    every block (widths may be ragged — they pad to w_max; a padded
    word's bits are zero and never count).  `index --uniform-sigs`
    forces both conditions on heterogeneous inputs; uniformly-chunked
    databases satisfy them by construction.  Reads only union headers."""
    if db.info.num_hashes != 1 or len(db.blocks) <= 1:
        return None
    from ..index.format import read_block_union_header

    n_bits = set()
    for b in range(len(db.blocks)):
        h = read_block_union_header(db.path, b)
        if h is None:
            return None
        n_bits.add(h[0])
    if len(n_bits) != 1:
        return None
    if len({blk.bits.shape[0] for blk in db.blocks}) != 1:
        return None
    return n_bits.pop()


def two_pass_ready(db) -> bool:
    """True when the device two-pass screened search can serve this DB
    (see _screen_geometry)."""
    return _screen_geometry(db) is not None


def build_packed_union(db, n_blocks: int):
    """(U_ext uint32 [num_bits+1, ceil(nb/32)], num_bits, fprs f64[nb])
    or None: bit g of row r = row r set in block g's union Bloom — ONE
    location plane probes every block's screen at once (the host's
    per-block union_count does nb u64-mods per k-mer; this does one).
    Requires the shared geometry of _screen_geometry."""
    from ..index.format import read_block_union

    nb_u = _screen_geometry(db)
    if nb_u is None:
        return None
    us = [read_block_union(db.path, b) for b in range(n_blocks)]
    Wu = -(-n_blocks // 32)
    U = np.zeros((nb_u + 1, Wu), np.uint32)
    fprs = []
    for g, (words, _nb, fpr) in enumerate(us):
        fprs.append(float(fpr))
        bits = np.unpackbits(
            words.view(np.uint8), bitorder="little", count=nb_u
        ).astype(np.uint32)
        U[:nb_u, g // 32] |= bits << np.uint32(g % 32)
    return U, nb_u, np.asarray(fprs, dtype=np.float64)


def _build_u_digit(loc_bk, S_pad: int):
    """Row-multiplicity matrix U bf16 [B, S_pad] from k-mer locations
    [B, K] (sentinel rows included — their bits are zero): U[b, s] =
    #windows of read b hashing to Bloom row s.  Built as a digit
    one-hot product on the MXU — U[b, hi*DL + lo] = sum_i eh[b, hi, i]
    * el[b, i, lo] with s = hi*DL + lo — which beats both XLA scatter
    and compare-iota ~2.5x at B=4096 (probe_group_gemm).  Exact: bf16
    represents integers <= 256 and multiplicity <= K <= the dedup
    threshold (256)."""
    import jax
    import jax.numpy as jnp

    assert S_pad % 64 == 0, S_pad
    DL = S_pad // 64
    hi = (loc_bk // DL).astype(jnp.int32)
    lo = (loc_bk % DL).astype(jnp.int32)
    eh = (
        hi[:, None, :] == jnp.arange(64, dtype=jnp.int32)[None, :, None]
    ).astype(jnp.bfloat16)
    el = (
        lo[:, :, None] == jnp.arange(DL, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.bfloat16)
    u = jax.lax.dot_general(
        eh, el, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return u.reshape(loc_bk.shape[0], S_pad).astype(jnp.bfloat16)


def _gemm_geometry(s_block: int, t_block: int):
    """(S_pad, T_t) for the grouped-GEMM pass 2, or None when the
    kernel's VMEM budget cannot hold a [S_pad, T_t] slab pair plus the
    U tile (large-s_block DBs keep the pair kernel)."""
    if t_block != 4096:
        return None
    S_pad = -(-(s_block + 1) // 128) * 128
    for T_t in (512, 256):
        # slab i8 + slab bf16 + double-buffered U tile + out tile
        vmem = S_pad * T_t * 3 + 2 * (128 * S_pad * 2 + 128 * T_t * 4)
        if vmem <= 12 << 20:
            return S_pad, T_t
    return None


def _gemm_pc_mode(t_block: int, s_block: int, n_blocks: int,
                  dedup_threshold: int):
    """'gemm' | 'interpret' | None: whether the grouped-GEMM Pallas
    pass 2 (pallas_count.make_pallas_group_count) serves the screened
    search.  Needs the tpu-native 4096-target blocks, VMEM room for
    the [S_pad, T_t] slabs (_gemm_geometry) and multiplicities that
    bf16 holds exactly (dedup threshold <= 256).
    KMCP_TPU_GEMM_PAIR=0 disables, =1 forces, =interpret forces the
    Mosaic interpreter; KMCP_TPU_PALLAS_COUNT=0 is the global kill
    switch; otherwise on for the TPU backend."""
    if _gemm_geometry(s_block, t_block) is None:
        return None
    if dedup_threshold > 256:
        return None  # bf16 multiplicity exactness bound
    if os.environ.get("KMCP_TPU_PALLAS_COUNT", "").lower() in ("0", "off"):
        return None
    env = os.environ.get("KMCP_TPU_GEMM_PAIR", "").lower()
    if env in ("0", "off"):
        return None
    if env == "interpret":
        return "interpret"
    if env != "1" and n_blocks > 64:
        # per-block tile padding (~nb*128 wasted GEMM rows) overtakes
        # the MXU win at high block counts: measured 119k vs the pair
        # kernel's 160k reads/s at nb=128 (524k targets); at nb=32 the
        # GEMM ties single-end and wins paired by ~18%
        return None
    import jax

    if env == "1" or jax.default_backend() == "tpu":
        return "gemm"
    return None


def _pair_pc_mode(t_block: int, s_block: int, n_blocks: int):
    """'pair' | 'interpret' | None: whether the block-stationary Pallas
    pair kernel (pallas_count.make_pallas_pair_count) replaces the XLA
    row gather in the screened pass-2.  Requires the tpu-native block
    width (128 words = 4096 targets/block) and VMEM room for one block
    slab (~512 B/row) plus the per-block threshold table (16 KB/block).
    KMCP_TPU_PALLAS_PAIR=0 disables, =1 forces, =interpret forces the
    Mosaic interpreter (hermetic CPU parity tests); otherwise it is on
    for the TPU backend only, alongside KMCP_TPU_PALLAS_COUNT=0 as the
    global kill switch."""
    if t_block != 4096:
        return None
    if os.environ.get("KMCP_TPU_PALLAS_COUNT", "").lower() in ("0", "off"):
        return None
    env = os.environ.get("KMCP_TPU_PALLAS_PAIR", "").lower()
    if env in ("0", "off"):
        return None
    if env == "interpret":
        return "interpret"
    s8 = -(-(s_block + 1) // 8)
    if s8 * 8 * 128 * 4 > (8 << 20) or n_blocks * 16 * 1024 > (4 << 20):
        return None
    import jax

    if env == "1" or jax.default_backend() == "tpu":
        return "pair"
    return None


@functools.lru_cache(maxsize=None)
def _make_screened_tail(
    cand_budget: int,
    pair_budget: int,
    min_len: int,
    dedup_threshold: int,
    n_blocks: int,
    t_block: int,
    s_block: int,
    n_pair_chunks: int,
    pair_pc=None,
    in_dedup: bool = False,
    gemm_pc=None,
):
    """Two-pass wide-T tail (single-hash): per-block union screen, then a
    dense count of ONLY the active (read, block) pairs.

    The reference's production regime counts every target for every read
    (util-db-search.go:939-964 broadcasts each query to every block); at
    GTDB scale that is ~131k target columns per read, of which a
    metagenomic read's true matches live in ~1 block.  Pass 1 gathers one
    word per k-mer from a packed block-union table (bit g of row r = row
    r set in block g's union Bloom, built by ``index --block-screen``)
    and keeps (read, block) pairs whose union-hit count clears the
    junk-FP band theta (same float64 host math as HostDB.screen_active);
    pass 2 gathers and counts only those pairs' rows — a ~n_blocks-fold
    cut of gather+count work.  Candidate order (ascending global flat
    index) and the (meta, aux) result layout match _make_count_tail, so
    the caller cannot tell which tail produced a result.

    Pairs are processed in ``n_pair_chunks`` chunks under lax.map so the
    [P_c, K, W_b] gathered-rows intermediate stays bounded; chunk-major
    splicing preserves pair order.  Overflow of either the pair budget or
    any chunk's candidate share reports n_cand = cand_budget + 1 so the
    caller's standard 4x retry (which scales both budgets) kicks in.

    With ``pair_pc`` = (K, interpret) pass 2 runs as the block-stationary
    Mosaic pair kernel instead (pallas_count.make_pallas_pair_count):
    pairs sort by block id so each block's bit slab is DMA'd into VMEM
    at most once per batch, the per-pair count folds VMEM-resident rows
    through the Harley-Seal counter (no HBM row gather at all), and the
    thresholds fuse in-kernel into a packed candidate bitmask — the tail
    then scans P*128 mask words instead of P*4096 count lanes.  The
    sorted outputs are restored to read-major pair order before the
    word scan, so candidates still emit in ascending (read, block,
    target) order and the (meta, aux) layout is byte-identical to the
    XLA pass 2.  ``bits_ext`` must then be the prepacked per-block slab
    array from pallas_count.pack_pair_blocks.

    With ``in_dedup`` the tail call takes ``vplanes`` = (vhi, vlo)
    [K, B] uint32 window values and reads over the dedup threshold are
    uniqued on device before BOTH passes (_dedup_value_planes over the
    Bloom and union planes, per-plane sentinels) instead of excluded —
    the paired streaming mode on multi-block screened DBs
    (util-db-search.go:800-805,874-908): the union theta, cmin and the
    reported qKmers all use the unique count, matching the host
    backend's dedup-then-screen order."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    pair_fn = None
    if pair_pc is not None:
        from .pallas_count import make_pallas_pair_count, thr_table_pairs

        pp_K, pp_interp = pair_pc
        pair_fn = make_pallas_pair_count(
            pp_K, s_block, n_blocks, interpret=pp_interp
        )
        assert pair_budget % pair_fn.pairs_per_step == 0, pair_budget
    gemm_fn = None
    if gemm_pc is not None:
        from .pallas_count import make_pallas_group_count

        gm_S_pad, gm_T_t, gm_interp = gemm_pc
        gemm_fn = make_pallas_group_count(
            gm_S_pad, n_blocks, t_block, gm_T_t, interpret=gm_interp
        )
        gm_P_t = gemm_fn.pairs_per_step
        # block-sorted groups pad to P_t-multiples; worst case each
        # block's group wastes < P_t slots
        gm_P_pad = -(-(pair_budget + n_blocks * gm_P_t) // gm_P_t) * gm_P_t

    def pair_chunk(bits_ext, loc_t, nkmers, pb_c, pg_c, pv_c, cmin, tmin2,
                   spos2, budget_c):
        """One chunk of pairs: pb_c/pg_c/pv_c [P_c].  Pairs are
        front-loaded, so trailing chunks are often ALL padding — a
        lax.cond skips their gather+count entirely (the pair budget's
        generosity then costs nothing at runtime)."""
        P_c = pb_c.shape[0]

        def heavy(_):
            sent = bits_ext.shape[0] - 1
            locp = jnp.take(loc_t, pb_c, axis=1)  # [K, P_c]
            r = jnp.where(
                locp == jnp.int32(s_block),
                jnp.int32(sent),
                locp + pg_c[None, :] * jnp.int32(s_block),
            )
            rows = jnp.take(bits_ext, r, axis=0)  # [K, P_c, W_b]
            counts = _unpack_count(rows)
            nk_c = jnp.take(nkmers, pb_c)
            c_thr = jnp.take(
                cmin, jnp.minimum(nk_c, cmin.shape[0] - 1)
            )[:, None]
            ok = (
                (counts >= c_thr)
                & (counts >= jnp.take(tmin2, pg_c, axis=0))
                & jnp.take(spos2, pg_c, axis=0)
                & pv_c[:, None]
            )
            cidx, n_c = _nonzero_asc(
                ok.reshape(-1), budget_c, P_c * t_block
            )
            cnt = jnp.take(
                counts.reshape(-1), jnp.minimum(cidx, P_c * t_block - 1)
            )
            cnt = jnp.where(cidx < P_c * t_block, cnt, 0)
            return n_c, cidx, jnp.clip(cnt, 0, 65535).astype(jnp.uint16)

        def empty(_):
            return (
                jnp.int32(0),
                jnp.full((budget_c,), P_c * t_block, jnp.int32),
                jnp.zeros((budget_c,), jnp.uint16),
            )

        return lax.cond(pv_c.any(), heavy, empty, None)

    def tail(bits_ext, u_ext, loc_t, locu_t, nk, lens, cmin, theta_tab,
             tmin, sizes_pos, vplanes=()):
        nkmers = nk[0]
        B = nkmers.shape[0]
        if in_dedup:
            # paired joined rows: unique the >threshold window sets over
            # BOTH location planes (Bloom rows sentinel = s_block, union
            # rows sentinel = the table's zero row) before either pass
            (loc_t, locu_t), nkmers = _dedup_value_planes(
                vplanes[0], vplanes[1], [loc_t, locu_t], nkmers,
                dedup_threshold, (s_block, u_ext.shape[0] - 1),
            )

        # ---- pass 1: per-block union-hit counts + screen threshold.
        # The element gather is the measured-fastest lowering (~13 ns/
        # element): a 128-byte sector gather + lane select ran ~1.6x
        # slower across two real-chip sessions, and pre-flattening the
        # table changed nothing — XLA's squeeze pass persists either way
        urows = jnp.take(u_ext, locu_t, axis=0)  # [K, B, Wu] k-major
        ucnt = _unpack_count(urows)[:, :n_blocks]  # [B, nb]
        theta = jnp.take(
            theta_tab, jnp.minimum(nkmers, theta_tab.shape[1] - 1), axis=1
        ).T  # [B, nb]
        read_ok = (
            (lens >= min_len)
            if in_dedup
            else (lens >= min_len) & (nkmers <= dedup_threshold)
        )
        active = (ucnt >= theta) & read_ok[:, None]
        pairs, n_pairs = _nonzero_asc(
            active.reshape(-1), pair_budget, B * n_blocks
        )
        pv = pairs < B * n_blocks
        pidx = jnp.minimum(pairs, B * n_blocks - 1)
        pb = pidx // n_blocks
        pg = pidx % n_blocks

        if gemm_fn is not None:
            # ---- pass 2: grouped GEMM on the MXU (make_pallas_group_
            # count).  Pairs sort by block and each block's group pads
            # to a P_t-multiple so every kernel tile touches one block;
            # counts come back in the natural target-major layout and
            # the thresholds + packed-mask word scan run in XLA over
            # the small [P_pad, t_block] array.
            W_b = t_block // 32
            P = pair_budget
            key = jnp.where(pv, pg, jnp.int32(n_blocks))
            order = jnp.argsort(key)
            rank = jnp.argsort(order)
            pb_s = jnp.take(pb, order)
            pg_s = jnp.take(key, order)
            gids = jnp.arange(n_blocks, dtype=jnp.int32)
            cnt = (pg_s[None, :] == gids[:, None]).sum(
                axis=1, dtype=jnp.int32
            )
            start = jnp.cumsum(cnt) - cnt
            padded = -(-cnt // gm_P_t) * gm_P_t
            pbase = jnp.cumsum(padded) - padded
            gsafe = jnp.minimum(pg_s, n_blocks - 1)
            slot_s = jnp.where(
                pg_s < n_blocks,
                jnp.take(pbase, gsafe)
                + jnp.arange(P, dtype=jnp.int32)
                - jnp.take(start, gsafe),
                jnp.int32(gm_P_pad),  # dropped by the scatters below
            )
            pb_pad = (
                jnp.full((gm_P_pad,), B, jnp.int32)
                .at[slot_s].set(pb_s, mode="drop")
            )
            pg_pad = (
                jnp.full((gm_P_pad,), n_blocks, jnp.int32)
                .at[slot_s].set(pg_s, mode="drop")
            )
            # groups are tile-aligned, so min over a tile is its block
            # (padding slots hold n_blocks)
            blk_tile = pg_pad.reshape(-1, gm_P_t).min(axis=1)
            u_all = _build_u_digit(loc_t.T, gm_S_pad)
            valid_pad = pb_pad < B
            u_p = jnp.where(
                valid_pad[:, None],
                jnp.take(u_all, jnp.minimum(pb_pad, B - 1), axis=0),
                jnp.bfloat16(0),
            )
            counts_p = gemm_fn(bits_ext, u_p, blk_tile)
            c_thresh = jnp.take(
                cmin, jnp.minimum(nkmers, cmin.shape[0] - 1)
            )
            cthr_pad = jnp.where(
                valid_pad,
                jnp.take(c_thresh, jnp.minimum(pb_pad, B - 1)),
                jnp.int32(2**30),
            )
            # tile-uniform per-target floors: tiles hold ONE block, so
            # the [P_pad, t_block] tmin/sizes gathers collapse to one
            # [n_tiles, t_block] row each (tmin folds sizes_pos via the
            # thr_table_pairs trick: ~2^30 on absent-target lanes)
            eff_thr = jnp.where(
                sizes_pos.reshape(n_blocks, t_block),
                tmin.reshape(n_blocks, t_block).astype(jnp.int32),
                jnp.int32(2**30),
            )
            eff_ext = jnp.concatenate(
                [eff_thr, jnp.full((1, t_block), 2**30, jnp.int32)]
            )
            n_tiles = gm_P_pad // gm_P_t
            thr_tile = jnp.take(
                eff_ext, jnp.minimum(blk_tile, n_blocks), axis=0
            )  # [n_tiles, t_block]
            okm = (
                counts_p.reshape(n_tiles, gm_P_t, t_block)
                >= jnp.maximum(
                    thr_tile[:, None, :],
                    cthr_pad.reshape(n_tiles, gm_P_t)[:, :, None],
                )
            )
            jb = jnp.arange(32, dtype=jnp.uint32)
            mask_pad = (
                okm.reshape(gm_P_pad, W_b, 32).astype(jnp.uint32)
                << jb[None, None, :]
            ).sum(axis=-1, dtype=jnp.uint32)  # bit j of word l = t l*32+j
            slot_rm = jnp.take(slot_s, rank)
            mask_rm = jnp.where(
                (slot_rm < gm_P_pad)[:, None],
                jnp.take(
                    mask_pad, jnp.minimum(slot_rm, gm_P_pad - 1), axis=0
                ),
                jnp.uint32(0),
            )
            total = lax.population_count(mask_rm).astype(jnp.int32).sum()

            # word-level candidate scan — same ordering contract as the
            # pair-kernel path (ascending read-major (pair, word, bit))
            nw_total = P * W_b
            wid, _nw = _nonzero_asc(
                (mask_rm != 0).reshape(-1), cand_budget, nw_total
            )
            wv = jnp.where(
                wid < nw_total,
                jnp.take(
                    mask_rm.reshape(-1), jnp.minimum(wid, nw_total - 1)
                ),
                jnp.uint32(0),
            )
            p_rm = jnp.minimum(wid // W_b, P - 1)
            bset = (wv[:, None] >> jb[None, :]) & jnp.uint32(1)
            q_w = jnp.take(pb, p_rm)
            t_w = jnp.take(pg, p_rm) * t_block + (wid % W_b) * 32
            crow = jnp.minimum(jnp.take(slot_rm, p_rm), gm_P_pad - 1)
            # 32 scalar gathers per candidate word (~3.4 ms/step at
            # budget 6144).  Both "faster" forms lower WORSE: a reshape
            # to [P*W, 32] rows costs a 2.5 ms relayout, and a (1, 32)
            # sliced lax.gather lowers to a serial while loop (13 ms)
            cmat = jnp.take(
                counts_p.reshape(-1),
                jnp.minimum(
                    crow[:, None] * t_block
                    + (wid % W_b)[:, None] * 32
                    + jnp.arange(32, dtype=jnp.int32)[None, :],
                    gm_P_pad * t_block - 1,
                ),
            )
            cidx2, _n2 = _nonzero_asc(
                (bset != 0).reshape(-1), cand_budget, cand_budget * 32
            )
            v2 = cidx2 < cand_budget * 32
            c2 = jnp.minimum(cidx2, cand_budget * 32 - 1)
            out_q = jnp.where(v2, jnp.take(q_w, c2 // 32), jnp.int32(B))
            out_t = jnp.where(
                v2, jnp.take(t_w, c2 // 32) + c2 % 32, jnp.int32(0)
            )
            out_cnt = jnp.where(v2, jnp.take(cmat.reshape(-1), c2), 0)
            n_rep = jnp.where(
                (total > cand_budget) | (n_pairs > pair_budget),
                jnp.int32(cand_budget) + jnp.int32(1),
                total,
            )
            meta = jnp.concatenate([n_rep[None], out_q, out_t])
            aux = jnp.concatenate(
                [
                    jnp.clip(out_cnt, 0, 65535).astype(jnp.uint16),
                    jnp.clip(nkmers, 0, 65535).astype(jnp.uint16),
                ]
            )
            return meta, aux

        if pair_fn is not None:
            # ---- pass 2: block-stationary Mosaic pair kernel
            W_b = t_block // 32  # 128 (asserted by pack_pair_blocks)
            P = pair_budget
            # sort pairs by block id (padding last) so the kernel re-DMAs
            # a block slab at most n_blocks+1 times per batch
            key = jnp.where(pv, pg, jnp.int32(n_blocks))
            order = jnp.argsort(key)
            rank = jnp.argsort(order)  # read-major pair -> sorted slot
            pb_s = jnp.take(pb, order)
            pg_s = jnp.take(key, order)
            locp = jnp.take(loc_t, pb_s, axis=1).T  # [P, K] block rows
            c_thresh = jnp.take(
                cmin, jnp.minimum(nkmers, cmin.shape[0] - 1)
            )
            # per-read floor; ~2^30 on padding pairs zeroes their mask
            cthr_p = jnp.where(
                pg_s < n_blocks,
                jnp.take(c_thresh, pb_s),
                jnp.int32(2**30),
            )
            tab = jnp.concatenate(
                [locp, pg_s[:, None], cthr_p[:, None]], axis=1
            ).astype(jnp.int32)
            thr = thr_table_pairs(tmin, sizes_pos, n_blocks)
            counts_s, mask_s = pair_fn(bits_ext, tab, thr)
            mask_rm = jnp.take(mask_s, rank, axis=0)  # read-major pairs
            total = lax.population_count(mask_rm).astype(jnp.int32).sum()

            # word-level candidate scan (a nonzero word holds >=1
            # candidate, so nonzero words > budget implies total >
            # budget and the retry fires before any word is dropped)
            nw_total = P * W_b
            wid, _nw = _nonzero_asc(
                (mask_rm != 0).reshape(-1), cand_budget, nw_total
            )
            wv = jnp.where(
                wid < nw_total,
                jnp.take(
                    mask_rm.reshape(-1), jnp.minimum(wid, nw_total - 1)
                ),
                jnp.uint32(0),
            )
            p_rm = jnp.minimum(wid // W_b, P - 1)
            jbits = jnp.arange(32, dtype=jnp.uint32)
            bset = (wv[:, None] >> jbits[None, :]) & jnp.uint32(1)
            q_w = jnp.take(pb, p_rm)  # [budget] read id per word slot
            t_w = jnp.take(pg, p_rm) * t_block + (wid % W_b) * 32
            # per-candidate counts gather from the kernel's sorted-order
            # counts array: pair row rank[p], lane j*128 + word
            crow = jnp.take(rank, p_rm)
            cmat = jnp.take(
                counts_s.reshape(-1),
                jnp.minimum(
                    crow[:, None] * (32 * W_b)
                    + jnp.arange(32, dtype=jnp.int32)[None, :] * W_b
                    + (wid % W_b)[:, None],
                    P * 32 * W_b - 1,
                ),
            )
            cidx2, _n2 = _nonzero_asc(
                (bset != 0).reshape(-1), cand_budget, cand_budget * 32
            )
            v2 = cidx2 < cand_budget * 32
            c2 = jnp.minimum(cidx2, cand_budget * 32 - 1)
            out_q = jnp.where(v2, jnp.take(q_w, c2 // 32), jnp.int32(B))
            out_t = jnp.where(
                v2, jnp.take(t_w, c2 // 32) + c2 % 32, jnp.int32(0)
            )
            out_cnt = jnp.where(v2, jnp.take(cmat.reshape(-1), c2), 0)
            n_rep = jnp.where(
                (total > cand_budget) | (n_pairs > pair_budget),
                jnp.int32(cand_budget) + jnp.int32(1),
                total,
            )
            meta = jnp.concatenate([n_rep[None], out_q, out_t])
            aux = jnp.concatenate(
                [
                    jnp.clip(out_cnt, 0, 65535).astype(jnp.uint16),
                    jnp.clip(nkmers, 0, 65535).astype(jnp.uint16),
                ]
            )
            return meta, aux

        # ---- pass 2: dense count of active pairs only (chunked)
        C = n_pair_chunks
        P_c = pair_budget // C
        # pairs are front-loaded (ascending compaction fills chunk 0
        # first), so every chunk gets the FULL candidate budget; the
        # splice scatter drops lanes beyond it and total>budget retries
        budget_c = cand_budget
        tmin2 = tmin.reshape(n_blocks, t_block)
        spos2 = sizes_pos.reshape(n_blocks, t_block)
        n_c, idx_c, cnt_c = lax.map(
            lambda a: pair_chunk(
                bits_ext, loc_t, nkmers, a[0], a[1], a[2],
                cmin, tmin2, spos2, budget_c,
            ),
            (pb.reshape(C, P_c), pg.reshape(C, P_c), pv.reshape(C, P_c)),
        )
        total = n_c.sum()
        overflowed = (n_c > budget_c).any() | (n_pairs > pair_budget)

        # split (read, target) ids of chunk i's local cidx: pair p =
        # i*P_c + cidx//t_block, read = pb[p], target = pg[p]*t_block +
        # cidx%t_block.  Split int32 ids carry no B*T < 2^31 limit (the
        # flat dense-tail encoding does), so huge-T DBs keep big
        # batches.  Pairs ascend by (b, g), t ascends within a pair, so
        # chunk-major splicing keeps the dense path's ascending order.
        p_loc = idx_c // t_block + (
            jnp.arange(C, dtype=jnp.int32) * P_c
        )[:, None]
        p_cap = jnp.minimum(p_loc, pair_budget - 1)
        valid_c = idx_c < P_c * t_block
        q_g = jnp.where(valid_c, jnp.take(pb, p_cap), B)
        t_g = jnp.where(
            valid_c, jnp.take(pg, p_cap) * t_block + idx_c % t_block, 0
        )
        n_eff = jnp.minimum(n_c, budget_c)
        offs = jnp.cumsum(n_eff) - n_eff
        lane = jnp.arange(budget_c, dtype=jnp.int32)
        po = jnp.where(
            lane[None, :] < n_eff[:, None],
            offs[:, None] + lane[None, :],
            cand_budget,  # dropped by the scatter
        ).reshape(-1)
        out_q = (
            jnp.full((cand_budget,), B, jnp.int32)
            .at[po].set(q_g.reshape(-1), mode="drop")
        )
        out_t = (
            jnp.zeros((cand_budget,), jnp.int32)
            .at[po].set(t_g.reshape(-1), mode="drop")
        )
        out_cnt = (
            jnp.zeros((cand_budget,), jnp.uint16)
            .at[po].set(cnt_c.reshape(-1), mode="drop")
        )
        n_rep = jnp.where(
            overflowed, jnp.int32(cand_budget) + jnp.int32(1),
            total.astype(jnp.int32),
        )
        meta = jnp.concatenate([n_rep[None], out_q, out_t])
        aux = jnp.concatenate(
            [out_cnt, jnp.clip(nkmers, 0, 65535).astype(jnp.uint16)]
        )
        return meta, aux

    return jax.jit(tail)


@functools.lru_cache(maxsize=None)
def _make_screened_step_sharded(
    cand_budget: int,
    pair_budget_l: int,
    min_len: int,
    dedup_threshold: int,
    n_blocks: int,
    t_block: int,
    s_block: int,
    mesh,
):
    """Sharded two-pass screened search: blocks shard over mesh axis 't'
    (column-stacked uniform geometry, DeviceDB multi-block mesh layout),
    reads over 'd' — the screened composition of SURVEY P3 (index
    sharded by target) at GTDB scale.  Every shard runs pass 1 (the
    cheap one-word-per-k-mer union count) over ALL blocks but keeps
    only pairs of its OWN blocks, densely counts those, compacts
    locally, and the packed segments merge on device
    (_merge_segments) — collective volume stays O(budget), independent
    of T, like the dense sharded step.

    Inputs are host-computed location planes (loc/loc_u [B, K] int32,
    sentinels = the respective moduli), so the step also runs on CPU
    meshes where the Mosaic hash kernel cannot.  Output: the legacy
    packed int32 array [1 + C + C + B] (idx ascending by global flat
    index — byte-identical to the single-device paths whenever no
    budget overflows)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    d_size = mesh.shape["d"]
    t_size = mesh.shape["t"]
    nb_l = n_blocks // t_size
    T = n_blocks * t_block

    def local(bits_l, u_ext, loc_l, locu_l, nk_l, lens_l, bval_l,
              cmin, theta_tab, tmin2, spos2):
        ti = lax.axis_index("t")
        di = lax.axis_index("d")
        B_d = loc_l.shape[0]
        B = B_d * d_size

        # ---- pass 1: union screen (replicated table, all blocks)
        urows = jnp.take(u_ext, locu_l.T, axis=0)  # [K, B_d, Wu]
        ucnt = _unpack_count(urows)[:, :n_blocks]
        theta = jnp.take(
            theta_tab, jnp.minimum(nk_l, theta_tab.shape[1] - 1), axis=1
        ).T
        read_ok = (
            (lens_l >= min_len) & (nk_l <= dedup_threshold) & bval_l
        )
        g = jnp.arange(n_blocks, dtype=jnp.int32)
        mine = (g >= ti * nb_l) & (g < (ti + 1) * nb_l)
        active = (ucnt >= theta) & read_ok[:, None] & mine[None, :]
        pairs, n_pairs_l = _nonzero_asc(
            active.reshape(-1), pair_budget_l, B_d * n_blocks
        )
        pv = pairs < B_d * n_blocks
        pidx = jnp.minimum(pairs, B_d * n_blocks - 1)
        pb = pidx // n_blocks
        pg = pidx % n_blocks
        pg_l = jnp.clip(pg - ti * nb_l, 0, nb_l - 1)

        # ---- pass 2: dense count of this shard's active pairs
        # bits_l [S_b+1, nb_l*W_b] -> flat [(S_b+1)*nb_l, W_b]; the
        # sentinel row's slices are all-zero for any block, so the
        # sentinel location maps to row s_block*nb_l + pg_l safely
        W_b = bits_l.shape[1] // nb_l
        bits3 = bits_l.reshape((s_block + 1) * nb_l, W_b)
        locp = jnp.take(loc_l, pb, axis=0)  # [P_l, K]
        r = (locp * nb_l + pg_l[:, None]).T  # [K, P_l]
        rows = jnp.take(bits3, r, axis=0)  # [K, P_l, W_b]
        counts = _unpack_count(rows)
        P_l = counts.shape[0]
        nk_p = jnp.take(nk_l, pb)
        c_thr = jnp.take(
            cmin, jnp.minimum(nk_p, cmin.shape[0] - 1)
        )[:, None]
        ok = (
            (counts >= c_thr)
            & (counts >= jnp.take(tmin2, pg, axis=0))
            & jnp.take(spos2, pg, axis=0)
            & pv[:, None]
        )
        cidx, n_c = _nonzero_asc(ok.reshape(-1), cand_budget, P_l * t_block)
        cnt = jnp.take(
            counts.reshape(-1), jnp.minimum(cidx, P_l * t_block - 1)
        )
        cnt = jnp.where(cidx < P_l * t_block, cnt, -1).astype(jnp.int32)
        p_of = jnp.minimum(cidx // t_block, P_l - 1)
        sent = min(B * T, 2**31 - 1)
        gidx = (
            (di.astype(jnp.int32) * B_d + jnp.take(pb, p_of)) * T
            + jnp.take(pg, p_of) * t_block
            + cidx % t_block
        )
        gidx = jnp.where(cidx < P_l * t_block, gidx, sent).astype(jnp.int32)
        # a pair-budget overflow must poison the global total so the
        # caller's 4x retry fires
        n_rep = jnp.where(
            n_pairs_l > pair_budget_l,
            jnp.int32(cand_budget) + jnp.int32(1),
            n_c,
        )
        out = _merge_segments(n_rep, gidx, cnt, cand_budget, B * T)
        nk_full = lax.all_gather(nk_l, "d").reshape(-1)
        return jnp.concatenate([out, nk_full])

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, "t"), P(), P("d", None), P("d", None), P("d"),
            P("d"), P("d"), P(), P(), P(), P(),
        ),
        out_specs=P(),
        check_vma=False,
    )

    def wrapper(bits_ext, u_ext, loc, locu, nkmers, lens,
                cmin, theta_tab, tmin, sizes_pos):
        B = loc.shape[0]
        B_pad = -(-B // d_size) * d_size
        bval = jnp.arange(B_pad) < B
        if B_pad != B:
            pad = B_pad - B
            loc = jnp.pad(loc, ((0, pad), (0, 0)),
                          constant_values=s_block)
            locu = jnp.pad(locu, ((0, pad), (0, 0)),
                           constant_values=u_ext.shape[0] - 1)
            nkmers = jnp.pad(nkmers, (0, pad))
            lens = jnp.pad(lens, (0, pad))
        tmin2 = tmin.reshape(n_blocks, t_block)
        spos2 = sizes_pos.reshape(n_blocks, t_block)
        out = sharded(
            bits_ext, u_ext, loc, locu, nkmers, lens, bval,
            cmin, theta_tab, tmin2, spos2,
        )
        head = 1 + 2 * cand_budget
        return jnp.concatenate([out[:head], out[head : head + B]])

    return jax.jit(wrapper)

