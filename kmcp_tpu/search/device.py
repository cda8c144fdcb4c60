"""Full-device search pipeline: gather -> AND -> count -> threshold ->
sparse compaction, one kernel invocation per read batch.

Built for the axon/PCIe reality that device->host bytes are the scarcest
resource: instead of pulling the dense [B, T] count matrix (~40 MB per
64k-read batch), all match thresholds are applied ON DEVICE and only the
packed sparse candidates (~20 B/read) cross back.

Threshold exactness: the reference compares float64 quantities
(count > nKmers*minQcov, queryFPR(n,count) <= maxFPR, count/targetKmers >=
minTcov; util-db-search.go:7466-7493).  All three are monotone in count,
so we precompute, in float64 on the host, the smallest passing count:

    cmin[n]  = max(min_kmers,
                   min{c : c > n*min_qcov},
                   min{c : queryFPR(n, c) <= max_fpr})        (per query n)
    tmin[t]  = min{c : c/size_t >= min_tcov}                  (per target)

and the device applies pure integer comparisons — bit-identical decisions
to the host reference path.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from .fpr import QueryFPRCache

_cache_enabled = False


def enable_compilation_cache():
    """Persist compiled XLA programs across processes (compiles through
    the axon tunnel can take minutes when it is degraded)."""
    global _cache_enabled
    if _cache_enabled:
        return
    _cache_enabled = True
    import jax

    cache_dir = os.environ.get(
        "KMCP_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "kmcp-tpu-jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def build_cmin_table(
    n_max: int,
    min_kmers: int,
    min_qcov: float,
    max_fpr: float,
    fpr_cache: QueryFPRCache,
) -> np.ndarray:
    """cmin[n] for n in 0..n_max (int32); cmin > n means 'cannot pass'."""
    out = np.empty(n_max + 1, dtype=np.int32)
    for n in range(n_max + 1):
        # smallest c with c > n*min_qcov (exact float64 compare)
        c_q = int(np.floor(n * min_qcov)) + 1
        while not (float(c_q) > n * min_qcov):
            c_q += 1
        c = max(min_kmers, c_q)
        # FPR is decreasing in c: advance until it passes (or exceeds n)
        while c <= n and fpr_cache(n, c) > max_fpr:
            c += 1
        out[n] = c if c <= n else n + 1  # n+1 == impossible
    return out


def build_tmin_table(sizes: np.ndarray, min_tcov: float) -> np.ndarray:
    """tmin[t]: smallest count with count/size >= min_tcov (float64)."""
    if min_tcov <= 0:
        return np.ones(len(sizes), dtype=np.int32)
    out = np.empty(len(sizes), dtype=np.int32)
    for i, s in enumerate(sizes):
        c = int(np.ceil(float(s) * min_tcov))
        while c / float(s) < min_tcov:
            c += 1
        while c > 0 and (c - 1) / float(s) >= min_tcov:
            c -= 1
        out[i] = max(c, 0)
    return out


def _csa(a, b, c):
    """Carry-save adder on 32 independent bit-lanes per uint32 element:
    returns (sum, carry) with a+b+c == sum + 2*carry per bit-column."""
    u = a ^ b
    return u ^ c, (a & b) | (u & c)


def _unpack_sum(planes):
    """Naive positional popcount of [G, N] uint32 -> [N, 32] int32
    (bit j of each word, summed over the leading axis)."""
    import jax.numpy as jnp

    shifts = jnp.arange(32, dtype=jnp.uint32)
    bit = (planes[..., None] >> shifts) & jnp.uint32(1)
    return bit.astype(jnp.int32).sum(axis=0)


def _unpack_count(rows):
    """Positional popcount over the k-mer axis: uint32 rows [K, P, W]
    (k-MAJOR — the pallas hash emits [K, B] location planes, so the
    gather produces this layout for free) -> int32 per-target counts
    [P, W*32] (bit j of word w = target w*32 + j) — the pospop/pand
    replacement contraction shared by every device tail.

    Algorithm: the Harley-Seal carry-save-adder tree — the same scheme
    as the reference's pospop AVX2/AVX512 assembly
    (/root/reference/kmcp/cmd/util-db-search.go:6728 calls
    shenwei356/pospop.Count8) — mapped onto 32-bit VPU lanes, where
    each uint32 element already carries 32 independent bit-columns.
    Groups of 16 k-mer planes collapse into one `sixteens` plane via 15
    CSAs (~75 lane-ops) while ones/twos/fours/eights chain across
    groups; only the per-group sixteens (K/16 planes) and the four
    residue planes pay the 32-shift bit-unpack.  ~11 lane-ops per
    (k-mer, word) vs ~96 for unpacking every plane (the round-1 form),
    and the k-major layout keeps (P, W) as one huge minor axis for the
    VPU.  K < 24 falls back to the naive unpack (the CSA residue
    unpacks dominate at tiny K)."""
    import jax.numpy as jnp

    K, Pp, W = rows.shape
    flat = rows.reshape(K, Pp * W)
    if K < 24:
        return _unpack_sum(flat).reshape(Pp, W * 32)

    G = K // 16
    tail = flat[G * 16 :]  # leftover planes: naive unpack below
    zero = jnp.zeros_like(flat[0])
    ones = twos = fours = eights = zero
    sixteens = []
    for g in range(G):
        x = [flat[16 * g + i] for i in range(16)]
        ones, t2a = _csa(ones, x[0], x[1])
        ones, t2b = _csa(ones, x[2], x[3])
        twos, f4a = _csa(twos, t2a, t2b)
        ones, t2a = _csa(ones, x[4], x[5])
        ones, t2b = _csa(ones, x[6], x[7])
        twos, f4b = _csa(twos, t2a, t2b)
        fours, e8a = _csa(fours, f4a, f4b)
        ones, t2a = _csa(ones, x[8], x[9])
        ones, t2b = _csa(ones, x[10], x[11])
        twos, f4a = _csa(twos, t2a, t2b)
        ones, t2a = _csa(ones, x[12], x[13])
        ones, t2b = _csa(ones, x[14], x[15])
        twos, f4b = _csa(twos, t2a, t2b)
        fours, e8b = _csa(fours, f4a, f4b)
        eights, s16 = _csa(eights, e8a, e8b)
        sixteens.append(s16)
    counts = _unpack_sum(jnp.stack(sixteens)) * 16
    counts += _unpack_sum(eights[None]) * 8
    counts += _unpack_sum(fours[None]) * 4
    counts += _unpack_sum(twos[None]) * 2
    counts += _unpack_sum(ones[None])
    if tail.shape[0]:
        counts += _unpack_sum(tail)
    return counts.reshape(Pp, W * 32)


def _nonzero_asc(flat_ok, budget: int, fill):
    """Ascending indices of the set lanes of a flat bool vector, padded
    with ``fill``: equivalent to ``jnp.nonzero(flat_ok, size=budget,
    fill_value=fill)`` but lowered as cumsum + vectorized binary search.
    XLA's TPU lowering of sized nonzero measured ~20x slower than this
    (305 ms vs 13 ms on a [256, 131072] candidate mask — the dominant
    cost of the whole search step before this rewrite).

    Returns (idx int32 [budget], n_set int32) where n_set is the true
    set-lane count (callers retry with a larger budget when it exceeds
    the budget)."""
    import jax.numpy as jnp

    c = jnp.cumsum(flat_ok.astype(jnp.int32))
    j = jnp.arange(1, budget + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(c, j, side="left").astype(jnp.int32)
    n = c[-1]
    return jnp.where(j <= n, idx, jnp.int32(fill)), n


def _compact_candidates(ok, counts, budget: int, cnt_fill):
    """Global candidate compaction of a [B, T] threshold mask: ascending
    flat indices + their counts + the EXACT candidate total (callers
    retry with a larger budget when it exceeds the budget).

    Always the flat ``_nonzero_asc`` cumsum+search.  A per-read
    two-level scheme (_nonzero_per_read) served the demo shape in
    rounds 2-3, but its per-read slot cap (4*budget/B = 8 slots at
    demo shape) poisoned every batch whose hit tail exceeded it — the
    oracle's per-read tail reaches 32+ there — costing two hidden
    full-batch retries per batch; widening the slots to T for
    correctness made it 5.3x SLOWER than flat (302 vs 57 ms at
    B=131k, T=160, measured on chip), so flat — which is exact by
    construction — wins everywhere."""
    import jax.numpy as jnp

    B, T = ok.shape
    idx, n = _nonzero_asc(ok.reshape(-1), budget, B * T)
    cnt = jnp.take(counts.reshape(-1), jnp.minimum(idx, B * T - 1))
    cnt = jnp.where(idx < B * T, cnt, cnt_fill).astype(jnp.int32)
    return idx, cnt, n


@functools.lru_cache(maxsize=None)
def _make_read_search_step(
    k: int,
    num_hashes: int,
    cand_budget: int,
    max_hash: int,
    min_len: int,
    dedup_threshold: int,
    mesh=None,
    paired_dedup: bool = False,
):
    """Fully-fused device search: raw read bytes -> ntHash1 -> Bloom
    locations -> gather -> AND -> count -> threshold -> compaction.

    The ntHash uses the same O(L) prefix-XOR formulation as the host path
    (kmcp_tpu/kmer/nthash.py) expressed as a `lax.associative_scan`; XLA
    emulates the uint64 lanes with uint32 pairs on TPU.  Only the raw
    ASCII reads cross host->device (~150 B/read) and only the packed
    candidate list crosses back (~20 B/read).

    With ``paired_dedup`` reads whose raw window count exceeds the dedup
    threshold are uniqued over the 64-bit k-mer values in-step instead
    of excluded (the reference's >256-k-mer dedup,
    util-db-search.go:874-908): the paired streaming mode, where joined
    mate rows routinely exceed 256 k-mers.
    """
    import jax
    import jax.numpy as jnp

    from ..kmer.nthash import SEEDS, SEEDS_COMP, BASE_CODE

    with jax.enable_x64(True):
        seeds_ascii = np.zeros(256, dtype=np.uint64)
        seedsc_ascii = np.zeros(256, dtype=np.uint64)
        ok_ascii = np.zeros(256, dtype=bool)
        for byte in range(256):
            code = BASE_CODE[byte]
            if code < 4:
                seeds_ascii[byte] = SEEDS[code]
                seedsc_ascii[byte] = SEEDS_COMP[code]
                ok_ascii[byte] = True

        def rol(x, r):
            r = r & jnp.uint64(63)
            return (x << r) | (x >> ((jnp.uint64(64) - r) & jnp.uint64(63)))

        def ror(x, r):
            r = r & jnp.uint64(63)
            return (x >> r) | (x << ((jnp.uint64(64) - r) & jnp.uint64(63)))

        def hash_reads(reads, S):
            """reads [B, L] uint8 ASCII (pad 0) -> Bloom locations
            [B, n_win, h] int32 (invalid windows -> sentinel row S) and
            per-read valid-k-mer counts; shared by the single-device and
            shard_map paths."""
            B, L = reads.shape
            n_win = L - k + 1
            seeds = jnp.asarray(seeds_ascii)
            seedsc = jnp.asarray(seedsc_ascii)
            okt = jnp.asarray(ok_ascii)

            idx = jnp.arange(L, dtype=jnp.uint64)[None, :]
            b_f = ror(jnp.take(seeds, reads.astype(jnp.int32), axis=0), idx)
            b_r = rol(jnp.take(seedsc, reads.astype(jnp.int32), axis=0), idx)
            c_f = jax.lax.associative_scan(jnp.bitwise_xor, b_f, axis=1)
            c_r = jax.lax.associative_scan(jnp.bitwise_xor, b_r, axis=1)
            zero = jnp.zeros((B, 1), dtype=jnp.uint64)
            cf_prev = jnp.concatenate([zero, c_f[:, : n_win - 1]], axis=1)
            cr_prev = jnp.concatenate([zero, c_r[:, : n_win - 1]], axis=1)
            i = jnp.arange(n_win, dtype=jnp.uint64)[None, :]
            fh = rol(c_f[:, k - 1 :] ^ cf_prev, i + jnp.uint64(k - 1))
            rh = ror(c_r[:, k - 1 :] ^ cr_prev, i)
            h = jnp.minimum(fh, rh)

            bad = (~jnp.take(okt, reads.astype(jnp.int32), axis=0)).astype(
                jnp.int32
            )
            cum = jnp.cumsum(bad, axis=1)
            cum_prev = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.int32), cum[:, : n_win - 1]], axis=1
            )
            valid = (cum[:, k - 1 :] - cum_prev) == 0
            valid &= h != jnp.uint64(0)
            valid &= h <= jnp.uint64(max_hash)
            # windows beyond the read's end are invalid via pad bytes (0)

            nkmers = valid.sum(axis=1, dtype=jnp.int32)
            if paired_dedup:
                # sort each read's masked values; duplicate nonzero
                # neighbors beyond the first invalidate their window
                h_m = jnp.where(valid, h, jnp.uint64(0))
                order = jnp.argsort(h_m, axis=1, stable=True)
                h_s = jnp.take_along_axis(h_m, order, axis=1)
                dup = jnp.zeros_like(valid).at[:, 1:].set(
                    (h_s[:, 1:] == h_s[:, :-1])
                    & (h_s[:, 1:] != jnp.uint64(0))
                )
                apply = nkmers > dedup_threshold
                nkmers = jnp.where(
                    apply, nkmers - dup.sum(axis=1, dtype=jnp.int32),
                    nkmers,
                )
                h = h_s
                valid = jnp.take_along_axis(valid, order, axis=1) & ~(
                    dup & apply[:, None]
                )

            if num_hashes == 1:
                loc = (h % jnp.uint64(S)).astype(jnp.int32)[..., None]
            else:
                a = (h >> jnp.uint64(32)).astype(jnp.uint32)
                b32 = h.astype(jnp.uint32)
                j = jnp.arange(num_hashes, dtype=jnp.uint32)
                v = a[..., None] + b32[..., None] * j
                loc = (v.astype(jnp.uint64) % jnp.uint64(S)).astype(jnp.int32)
            loc = jnp.where(valid[..., None], loc, jnp.int32(S))
            return loc, nkmers

        def count_reads(bits_ext, loc):
            """gather -> AND -> positional popcount: [B, T_local]."""
            rows = jnp.take(bits_ext, loc, axis=0)  # [B,K,h,W]
            acc = rows[..., 0, :]
            for jj in range(1, num_hashes):
                acc = acc & rows[..., jj, :]
            return _unpack_count(acc.transpose(1, 0, 2))

        def read_ok(counts, nkmers, lens, cmin, tmin_c, spos_c):
            c_thresh = jnp.take(
                cmin, jnp.minimum(nkmers, cmin.shape[0] - 1), axis=0
            )[:, None]
            ok = (
                (counts >= c_thresh)
                & (counts >= tmin_c[None, :])
                & spos_c[None, :]
                & (lens >= min_len)[:, None]
            )
            if not paired_dedup:
                ok &= (nkmers <= dedup_threshold)[:, None]
            return ok

        def step(bits_ext, reads, lens, cmin, tmin, sizes_pos):
            """reads [B, L] uint8 ASCII (pad 0); lens [B] int32."""
            B = reads.shape[0]
            loc, nkmers = hash_reads(reads, bits_ext.shape[0] - 1)
            counts = count_reads(bits_ext, loc)
            ok = read_ok(counts, nkmers, lens, cmin, tmin, sizes_pos)
            cidx, cnt, n_cand = _compact_candidates(
                ok, counts, cand_budget, -1
            )
            return jnp.concatenate([n_cand[None], cidx, cnt, nkmers])

        if mesh is None:
            jitted = jax.jit(step)
        else:
            # shard_map: per-shard compaction, tiny all-gathered segments
            # (see _sharded_compact) instead of GSPMD's dense all-gather
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            d_size = mesh.shape["d"]
            t_size = mesh.shape["t"]

            def local(bits_l, reads_l, lens_l, bval_l, cmin, tmin, spos):
                loc, nkmers = hash_reads(reads_l, bits_l.shape[0] - 1)
                counts = count_reads(bits_l, loc)  # [B_d, T_l]
                B_d, W_t = counts.shape[0], counts.shape[1] // 32
                ti = jax.lax.axis_index("t")
                tg = _global_target_ids(1, W_t, t_size, ti)
                ok = read_ok(
                    counts, nkmers, lens_l, cmin,
                    jnp.take(tmin, tg), jnp.take(spos, tg),
                ) & bval_l[:, None]
                T = W_t * t_size * 32
                out = _sharded_compact(
                    counts, ok, tg, T, B_d * d_size, B_d,
                    jax.lax.axis_index("d"), cand_budget,
                )
                nk_full = jax.lax.all_gather(nkmers, "d").reshape(-1)
                return jnp.concatenate([out, nk_full])

            sharded = shard_map(
                local,
                mesh=mesh,
                in_specs=(
                    P(None, "t"), P("d", None), P("d"), P("d"),
                    P(), P(), P(),
                ),
                out_specs=P(),
                check_vma=False,
            )

            def wrapper(bits_ext, reads, lens, cmin, tmin, sizes_pos):
                B = reads.shape[0]
                B_pad = -(-B // d_size) * d_size
                bval = jnp.arange(B_pad) < B
                if B_pad != B:
                    reads = jnp.pad(reads, ((0, B_pad - B), (0, 0)))
                    lens = jnp.pad(lens, (0, B_pad - B))
                out = sharded(
                    bits_ext, reads, lens, bval, cmin, tmin, sizes_pos
                )
                head = 1 + 2 * cand_budget
                return jnp.concatenate([out[:head], out[head : head + B]])

            jitted = jax.jit(wrapper)

    def call(*args):
        with jax.enable_x64(True):
            return jitted(*args)

    return call


def _sharded_compact(counts, ok, tg, T, B, B_d, di, cand_budget):
    """Per-shard candidate compaction + cross-shard merge (runs INSIDE a
    shard_map body; every array is shard-local).

    The naive GSPMD lowering of ``jnp.nonzero`` over a (d, t)-sharded
    [B, T] count matrix all-gathers the whole dense matrix (measured:
    671 MB/step at T=131k, B=1024 — tools/comm_share.py), an ICI-time
    share of ~79%.  Instead each shard compacts its own candidates
    (budget-bounded) and only the packed segments cross the ICI — the
    SPMD analog of the reference's per-node search + offline merge
    (/root/reference/kmcp/cmd/merge.go:333-367).  The merged list is
    re-sorted by global flat index, so the output is byte-identical to
    the dense single-device path whenever total <= cand_budget.

    counts [B_d, T_l] int32; ok [B_d, T_l] bool; tg [T_l] int32 global
    target ids; di = this shard's 'd' index.  Returns
    concat([total, idx_sorted, cnt_sorted]) — replicated after the
    all-gathers."""
    import jax.numpy as jnp
    from jax import lax

    T_l = counts.shape[1]
    flat_ok = ok.reshape(-1)
    pos, n_cand_l = _nonzero_asc(flat_ok, cand_budget, B_d * T_l)
    b_l = (pos // T_l).astype(jnp.int32)
    t_l = (pos % T_l).astype(jnp.int32)
    idx = (di.astype(jnp.int32) * B_d + b_l) * T + jnp.take(
        tg, jnp.minimum(t_l, T_l - 1)
    )
    idx = jnp.where(
        pos < B_d * T_l, idx, min(B * T, 2**31 - 1)
    ).astype(jnp.int32)
    cnt = jnp.take(counts.reshape(-1), jnp.minimum(pos, B_d * T_l - 1))
    cnt = jnp.where(pos < B_d * T_l, cnt, -1).astype(jnp.int32)
    return _merge_segments(n_cand_l, idx, cnt, cand_budget, B * T)


def _merge_segments(n_cand_l, idx, cnt, cand_budget, sent):
    """All-gather each shard's packed candidate segment over ('t', 'd')
    and splice + re-sort by global flat index (runs INSIDE a shard_map
    body).  Returns concat([total, idx_sorted, cnt_sorted]),
    replicated."""
    import jax.numpy as jnp
    from jax import lax

    sent = min(sent, 2**31 - 1)
    seg = jnp.concatenate([n_cand_l[None], idx, cnt])
    segs = lax.all_gather(seg, "t")
    segs = lax.all_gather(segs, "d").reshape(-1, seg.shape[0])
    total = segs[:, 0].sum()
    n_i = jnp.minimum(segs[:, 0], cand_budget)
    offs = jnp.cumsum(n_i) - n_i
    lane = jnp.arange(cand_budget, dtype=jnp.int32)
    po = jnp.where(
        lane[None, :] < n_i[:, None],
        offs[:, None] + lane[None, :],
        cand_budget,
    ).reshape(-1)
    idx_all = segs[:, 1 : 1 + cand_budget].reshape(-1)
    cnt_all = segs[:, 1 + cand_budget :].reshape(-1)
    out_idx = (
        jnp.full((cand_budget,), sent, jnp.int32).at[po]
        .set(idx_all, mode="drop")
    )
    out_cnt = (
        jnp.full((cand_budget,), -1, jnp.int32).at[po]
        .set(cnt_all, mode="drop")
    )
    order = jnp.argsort(out_idx)  # sentinel sorts last
    return jnp.concatenate(
        [total[None], jnp.take(out_idx, order), jnp.take(out_cnt, order)]
    )


def _global_target_ids(nb, W_t, t_size, ti):
    """Global target ids of this 't' shard's [nb, W_t, 32] local targets
    (blocks stacked on the word axis before sharding)."""
    import jax.numpy as jnp

    W = W_t * t_size
    return (
        (
            jnp.arange(nb, dtype=jnp.int32)[:, None, None] * W
            + ti.astype(jnp.int32) * W_t
            + jnp.arange(W_t, dtype=jnp.int32)[None, :, None]
        )
        * 32
        + jnp.arange(32, dtype=jnp.int32)[None, None, :]
    ).reshape(-1)


def _remap_bitmajor(cidx, W: int, T: int, n_rows: int):
    """Remap compacted candidate lanes from the Pallas count kernel's
    bit-major layout (lane p = j*W + w) back to real target ids
    (t = w*32 + j); sentinel lanes (>= n_rows*T) pass through.  The
    permuted within-read order is normalized downstream by the stream
    layer's lexsort (stream.py:513)."""
    import jax.numpy as jnp

    p = cidx % T
    b = cidx // T
    t = (p % W) * 32 + p // W
    return jnp.where(cidx < n_rows * T, b * T + t, cidx)


def _dedup_value_planes(vhi, vlo, locs, nk, threshold: int, sentinel: int):
    """Per-read unique over 64-bit k-mer values — the reference's
    >256-k-mer dedup (util-db-search.go:874-908), on device, for reads
    whose RAW window count exceeds ``threshold`` (smaller sets keep
    duplicates, reproducing the reference quirk).  Duplicate windows
    beyond the first are re-pointed at the sentinel row in every
    location plane and the read's k-mer count drops to its unique count.

    vhi/vlo: [K, B] uint32 halves of the window's ntHash value, 0 for
    invalid windows (the kernel zeroes them; a valid window can never
    hash to 0 — h==0 is defined invalid).  locs: list of [K, B] int32
    planes.  ``sentinel`` is one int for all planes or a sequence of
    per-plane sentinels (the screened path's Bloom and union planes
    live in different modulus spaces).  Window order within a plane is
    irrelevant downstream (the count tail sums over K), so planes are
    returned value-sorted.

    ONE multi-operand lax.sort (num_keys=2, the location planes riding
    as payloads) replaces two chained stable argsorts + per-plane
    take_along_axis gathers: duplicates only need to land ADJACENT,
    and every copy of a duplicated window carries identical locations,
    so neither stability nor which copy survives matters."""
    import jax.numpy as jnp
    from jax import lax

    sents = (
        list(sentinel)
        if isinstance(sentinel, (tuple, list))
        else [sentinel] * len(locs)
    )

    sorted_ops = lax.sort(
        (vhi, vlo, *locs), dimension=0, num_keys=2, is_stable=False
    )
    hi_s, lo_s = sorted_ops[0], sorted_ops[1]
    valid = (hi_s != 0) | (lo_s != 0)
    prev_same = jnp.zeros_like(valid).at[1:].set(
        (hi_s[1:] == hi_s[:-1]) & (lo_s[1:] == lo_s[:-1])
    )
    dup = prev_same & valid
    apply = nk > threshold
    drop = dup & apply[None, :]
    nk_eff = jnp.where(apply, nk - dup.sum(axis=0, dtype=nk.dtype), nk)
    out = [
        jnp.where(drop, jnp.int32(s), loc_s)
        for loc_s, s in zip(sorted_ops[2:], sents)
    ]
    return out, nk_eff


def _pc_mode(h: int, w: int, s_ext: int = 0):
    """'resident' | 'ring' | 'interpret' | 'interpret-resident' | None:
    which fused Pallas gather+popcount kernel (pallas_count.py) replaces
    the XLA gather tail.  Single-hash only (there is no pand row-AND to
    fuse, pallas_count module docstring) and W must be a whole number
    of uint8-lane groups.  Default on the TPU backend: the VMEM-
    RESIDENT kernel when the row count fits its slab geometry
    (fine-chunked wide-T DBs), else the DMA-ring kernel.
    KMCP_TPU_PALLAS_COUNT=0 disables, =1 auto-selects, =ring forces the
    ring kernel, =interpret / =interpret-resident force the interpreter
    (hermetic CPU parity tests).  Multi-hash DBs (h <= 4) fuse the pand
    row-AND in-kernel; their row-ANDs cannot decompose across VMEM row
    groups, so h > 1 skips the multi-group resident engine."""
    if not 1 <= h <= 4 or w % 8:
        return None
    env = os.environ.get("KMCP_TPU_PALLAS_COUNT", "").lower()
    if env in ("0", "off"):
        return None
    if env in ("interpret", "interpret-resident", "interpret-mask",
               "interpret-ring-mask"):
        return env
    if w % 1024:
        # Mosaic DMAs slice whole (8, 128)-tiled lane groups: a row view
        # [8, W//8] is only HBM-addressable when W//8 is a multiple of
        # 128.  Narrower DBs keep the XLA gather tail — the kernels
        # exist for the wide-row regime (W=4096 at 131k targets).
        return None
    import jax

    if env in ("1", "ring", "resident", "mask", "ring-mask") or (
        jax.default_backend() == "tpu"
    ):
        if env in ("ring", "resident", "mask", "ring-mask"):
            return env
        from .pallas_count import resident_geometry

        geo = s_ext and resident_geometry(s_ext, w)
        if geo and geo[0] == 1:
            # single row group: thresholds fuse into the kernel (the
            # packed candidate bitmask tail)
            return "mask"
        if geo and h == 1:
            # multi-group: plain resident counts + XLA tail
            return "resident"
        # large-S (or multi-hash multi-group): DMA-ring gather with the
        # same fused-threshold mask
        return "ring-mask"
    return None


@functools.lru_cache(maxsize=None)
def _make_count_tail(
    cand_budget: int,
    min_len: int,
    dedup_threshold: int,
    n_chunks: int = 1,
    pc_cfg=None,
    in_dedup: bool = False,
):
    """Jitted tail after device hashing: gather -> count -> threshold ->
    compaction (single-hash).  loc_t arrives transposed [K, B] from the
    Pallas hashing kernel.

    With ``pc_cfg`` = (K, W, interpret) the gather + positional popcount
    run as ONE fused Mosaic kernel (pallas_count.make_pallas_count) —
    the gathered rows never round-trip through HBM.  The kernel counts
    in the bit-major lane layout, so the tail then expects the tmin /
    sizes_pos arguments PERMUTED by pallas_count.perm_t_of_p and remaps
    candidate indices after compaction (_remap_bitmajor).

    Returns (meta int32 [1 + budget] = [n_cand, idx...],
    aux uint16 [budget + B] = [cnt..., nkmers...]): device->host bytes
    are the scarce resource on the TPU tunnel (~32 MB/s measured), and
    counts/nkmers never exceed the per-read window count, so uint16
    halves the payload of two of the three result columns
    (11 bytes/read at budget 1.5*B vs 20 for the all-int32 layout).

    With ``n_chunks`` > 1 the batch is processed in B/n_chunks-read
    chunks under ``lax.map`` so the [B_c, K, W] gathered-rows
    intermediate stays bounded — at GTDB scale (T = 131k targets,
    W = 4096 words) a full 16k-read gather would be 37 GB; 256-read
    chunks keep it under 600 MB while one dispatch still amortizes the
    tunnel round-trip over the whole batch.  Per-chunk compactions are
    spliced into the same global (meta, aux) layout (chunk-major order
    preserves the ascending flat-index order); if any chunk overflows
    its budget share, the reported n_cand exceeds the global budget so
    the caller's standard 4x retry kicks in."""
    if dedup_threshold >= 65535:
        # reads passing the dedup filter can carry up to dedup_threshold
        # k-mers; the aux columns are uint16, so a larger threshold would
        # silently saturate counts/nkmers.  Callers (stream.py::run's
        # use_pallas predicate) route such configurations to the legacy
        # int32 scan path / object engine instead.
        raise ValueError(
            f"kmer_dedup_threshold {dedup_threshold} >= 65535 would "
            "overflow the uint16 aux layout"
        )
    import jax
    import jax.numpy as jnp
    from jax import lax

    pc_fn = None
    pc_engine = None
    pc_H = 1
    if pc_cfg is not None:
        pc_K, pc_W, pc_mode, pc_S_ext = pc_cfg[:4]
        pc_H = pc_cfg[4] if len(pc_cfg) > 4 else 1
        interp = pc_mode.startswith("interpret")
        pc_engine = pc_mode.removeprefix("interpret")
        pc_engine = pc_engine.removeprefix("-") or "ring"
        if pc_engine == "mask":
            from .pallas_count import make_pallas_count_masked

            pc_fn = make_pallas_count_masked(
                pc_K, pc_W, pc_S_ext, interpret=interp, num_hashes=pc_H
            )
        elif pc_engine == "resident":
            from .pallas_count import make_pallas_count_resident

            pc_fn = make_pallas_count_resident(
                pc_K, pc_W, pc_S_ext, interpret=interp, num_hashes=pc_H
            )
        else:
            from .pallas_count import make_pallas_count

            pc_fn = make_pallas_count(
                pc_K, pc_W, interpret=interp,
                masked=pc_engine == "ring-mask", num_hashes=pc_H,
            )
    pc_resident = pc_engine in ("resident", "mask")
    pc_masked = pc_engine in ("mask", "ring-mask")

    def pc_loc(loc_ts):
        """Location planes -> the kernels' layout: [B, K] single-hash,
        [B, K, h] multi-hash (the fused pand row-AND)."""
        if len(loc_ts) == 1:
            return loc_ts[0].T
        return jnp.stack(loc_ts, axis=-1).transpose(1, 0, 2)

    def gather_count(bits_ext, loc_t):
        """[K, B?] single-hash locations (non-pc) or pc-layout locations
        -> [B?, T] counts (bit-major lane layout when the fused Pallas
        kernel is active).  In resident/mask modes ``bits_ext`` is the
        prepacked slab array from pallas_count.pack_resident."""
        if pc_fn is not None:
            if pc_engine == "resident":
                return pc_fn(bits_ext, loc_t)
            S_ext = bits_ext.shape[0]
            return pc_fn(
                bits_ext.reshape(S_ext, 8, pc_W // 8), loc_t
            )
        rows = jnp.take(bits_ext, loc_t, axis=0)  # [K,B?,W] k-major
        return _unpack_count(rows)

    def masked_core(bits5d, loc_t, nk_c, lens_c, cmin, tmin, sizes_pos,
                    budget_c):
        """Fused-threshold path: the kernel emits counts + a packed
        candidate bitmask; candidates extract word-level (B*W words
        instead of B*32*W lanes).  Emission order is (word, bit) —
        not globally ascending — which downstream sorts normalize
        (stream.py lexsort; the object paths never see this tail).
        Returns (n_cand, cidx bit-major flat ids, cnt uint16)."""
        from .pallas_count import thr_table_masked, thr_table_ring

        c_thresh = jnp.take(
            cmin, jnp.minimum(nk_c, cmin.shape[0] - 1), axis=0
        )
        excl = lens_c < min_len
        if not in_dedup:
            excl |= nk_c > dedup_threshold
        cthr = jnp.where(excl, jnp.int32(2**30), c_thresh).astype(
            jnp.int32
        )[:, None]
        if pc_engine == "ring-mask":
            thr = thr_table_ring(tmin, sizes_pos, pc_W)
            counts, mask = pc_fn(
                bits5d.reshape(bits5d.shape[0], 8, pc_W // 8),
                loc_t, cthr, thr,
            )
        else:
            thr = thr_table_masked(tmin, sizes_pos, pc_W)
            counts, mask = pc_fn(bits5d, loc_t, cthr, thr)
        B_c = mask.shape[0]
        T = 32 * pc_W
        wcnt = lax.population_count(mask).astype(jnp.int32)
        n_cand = wcnt.sum()
        nw_total = B_c * pc_W
        wid, _n_w = _nonzero_asc(
            (mask != 0).reshape(-1), budget_c, nw_total
        )
        wvals = jnp.where(
            wid < nw_total,
            jnp.take(mask.reshape(-1), jnp.minimum(wid, nw_total - 1)),
            jnp.uint32(0),
        )
        jbits = jnp.arange(32, dtype=jnp.uint32)
        bset = (wvals[:, None] >> jbits[None, :]) & jnp.uint32(1)
        pid = (
            (wid // pc_W)[:, None] * T
            + jnp.arange(32, dtype=jnp.int32)[None, :] * pc_W
            + (wid % pc_W)[:, None]
        )
        cidx2, _n2 = _nonzero_asc(
            (bset != 0).reshape(-1), budget_c, budget_c * 32
        )
        sent = min(B_c * T, 2**31 - 1)
        pids = jnp.where(
            cidx2 < budget_c * 32,
            jnp.take(
                pid.reshape(-1), jnp.minimum(cidx2, budget_c * 32 - 1)
            ),
            jnp.int32(sent),
        )
        cnt = jnp.where(
            pids < B_c * T,
            jnp.take(
                counts.reshape(-1), jnp.minimum(pids, B_c * T - 1)
            ),
            0,
        )
        return n_cand, pids, jnp.clip(cnt, 0, 65535).astype(jnp.uint16)

    def chunk_tail(bits_ext, loc_hkb, nk_c, lens_c, cmin, tmin, sizes_pos,
                   budget_c):
        """One chunk: loc_hkb [h, K, B_c] stacked location planes."""
        loc_pc_c = (
            loc_hkb[0].T if loc_hkb.shape[0] == 1
            else loc_hkb.transpose(2, 1, 0)
        )
        if pc_masked:
            B_c = loc_hkb.shape[2]
            n_cand, pids, cnt = masked_core(
                bits_ext, loc_pc_c, nk_c, lens_c, cmin, tmin,
                sizes_pos, budget_c,
            )
            cidx = _remap_bitmajor(pids, pc_W, 32 * pc_W, B_c)
            return n_cand, cidx, cnt
        counts = (
            gather_count(bits_ext, loc_pc_c) if pc_fn is not None
            else gather_count(bits_ext, loc_hkb[0])
        )
        B_c = counts.shape[0]
        c_thresh = jnp.take(
            cmin, jnp.minimum(nk_c, cmin.shape[0] - 1), axis=0
        )[:, None]
        ok = (
            (counts >= c_thresh)
            & (counts >= tmin[None, :])
            & sizes_pos[None, :]
            & (lens_c >= min_len)[:, None]
        )
        if not in_dedup:
            ok &= (nk_c <= dedup_threshold)[:, None]
        flat_ok = ok.reshape(-1)
        T = counts.shape[1]
        cidx, n_cand = _nonzero_asc(flat_ok, budget_c, B_c * T)
        cnt = jnp.take(counts.reshape(-1), jnp.minimum(cidx, B_c * T - 1))
        cnt = jnp.where(cidx < B_c * T, cnt, 0)
        if pc_fn is not None:
            cidx = _remap_bitmajor(cidx, pc_W, T, B_c)
        return n_cand, cidx, jnp.clip(cnt, 0, 65535).astype(jnp.uint16)

    def tail(bits_ext, loc_ts, nk, lens, cmin, tmin, sizes_pos,
             vplanes=()):
        # loc_ts: tuple of transposed [K, B] location planes, one per
        # hash function; rows AND together across planes.  (Chunked mode
        # is only built for the single-hash pallas path.)  With
        # ``in_dedup``, vplanes = (vhi, vlo) [K, B] window values and
        # over-threshold reads are uniqued here (_dedup_value_planes);
        # nkmers and the reported qKmers become unique counts, matching
        # the host path's in-kernel dedup.
        nkmers = nk[0]
        if in_dedup:
            sent = (pc_cfg[3] - 1) if (pc_cfg and pc_resident) else (
                bits_ext.shape[0] - 1
            )
            loc_ts, nkmers = _dedup_value_planes(
                vplanes[0], vplanes[1], list(loc_ts), nkmers,
                dedup_threshold, sent,
            )
        aux_nk = jnp.clip(nkmers, 0, 65535).astype(jnp.uint16)

        if n_chunks == 1 or (len(loc_ts) > 1 and pc_fn is None):
            if pc_masked:
                B = loc_ts[0].shape[1]
                n_cand, pids, cnt = masked_core(
                    bits_ext, pc_loc(loc_ts), nkmers, lens, cmin, tmin,
                    sizes_pos, cand_budget,
                )
                cidx = _remap_bitmajor(pids, pc_W, 32 * pc_W, B)
                meta = jnp.concatenate(
                    [n_cand.astype(jnp.int32)[None], cidx]
                )
                aux = jnp.concatenate([cnt, aux_nk])
                return meta, aux
            if pc_fn is not None:
                counts = gather_count(bits_ext, pc_loc(loc_ts))
            else:
                acc = None
                for loc_t in loc_ts:
                    rows = jnp.take(bits_ext, loc_t, axis=0)  # [K,B,W]
                    acc = rows if acc is None else (acc & rows)
                counts = _unpack_count(acc)
            B = counts.shape[0]
            c_thresh = jnp.take(
                cmin, jnp.minimum(nkmers, cmin.shape[0] - 1), axis=0
            )[:, None]
            ok = (
                (counts >= c_thresh)
                & (counts >= tmin[None, :])
                & sizes_pos[None, :]
                & (lens >= min_len)[:, None]
            )
            if not in_dedup:
                ok &= (nkmers <= dedup_threshold)[:, None]
            cidx, cnt, n_cand = _compact_candidates(
                ok, counts, cand_budget, 0
            )
            if pc_fn is not None:
                cidx = _remap_bitmajor(cidx, pc_W, counts.shape[1], B)
            meta = jnp.concatenate([n_cand[None], cidx])
            aux = jnp.concatenate(
                [jnp.clip(cnt, 0, 65535).astype(jnp.uint16), aux_nk]
            )
            return meta, aux

        # chunked path: stack the h location planes and split the batch
        # (h > 1 only reaches here on the pc path, whose kernels fuse
        # the row-AND; the XLA h>1 formulation stays dense above)
        loc_st = jnp.stack(loc_ts)  # [h, K, B]
        h_pl, K, B = loc_st.shape
        C = n_chunks
        B_c = B // C
        T = 32 * pc_W if pc_fn is not None else bits_ext.shape[1] * 32
        budget_c = -(-cand_budget // C)

        loc_chunks = loc_st.reshape(h_pl, K, C, B_c).transpose(2, 0, 1, 3)
        nk_chunks = nkmers.reshape(C, B_c)
        lens_chunks = lens.reshape(C, B_c)
        n_c, idx_c, cnt_c = lax.map(
            lambda args: chunk_tail(
                bits_ext, args[0], args[1], args[2],
                cmin, tmin, sizes_pos, budget_c,
            ),
            (loc_chunks, nk_chunks, lens_chunks),
        )
        total = n_c.sum()
        overflowed = (n_c > budget_c).any()
        # global flat index: chunk i's read b_local is read i*B_c+b_local
        idx_g = idx_c + (
            jnp.arange(C, dtype=jnp.int32) * (B_c * T)
        )[:, None]
        n_eff = jnp.minimum(n_c, budget_c)
        offs = jnp.cumsum(n_eff) - n_eff
        lane = jnp.arange(budget_c, dtype=jnp.int32)
        po = jnp.where(
            lane[None, :] < n_eff[:, None],
            offs[:, None] + lane[None, :],
            cand_budget,  # dropped by the scatter
        ).reshape(-1)
        out_idx = (
            # sentinel clamped to int32 (B*T can reach 2^31; lanes beyond
            # meta[0] are never read)
            jnp.full((cand_budget,), min(B * T, 2**31 - 1), jnp.int32)
            .at[po].set(idx_g.reshape(-1), mode="drop")
        )
        out_cnt = (
            jnp.zeros((cand_budget,), jnp.uint16)
            .at[po].set(cnt_c.reshape(-1), mode="drop")
        )
        # any per-chunk overflow must trigger the caller's global retry
        n_rep = jnp.where(
            overflowed, jnp.int32(cand_budget) + jnp.int32(1),
            total.astype(jnp.int32),
        )
        meta = jnp.concatenate([n_rep[None], out_idx])
        aux = jnp.concatenate([out_cnt, aux_nk])
        return meta, aux

    return jax.jit(tail)


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
            # rows sentinel = u_ext's zero row) before either pass
            (loc_t, locu_t), nkmers = _dedup_value_planes(
                vplanes[0], vplanes[1], [loc_t, locu_t], nkmers,
                dedup_threshold, (s_block, u_ext.shape[0] - 1),
            )

        # ---- pass 1: per-block union-hit counts + screen threshold
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


@functools.lru_cache(maxsize=None)
def _make_search_step(num_hashes: int, cand_budget: int, mesh=None):
    """Jitted search step; with ``mesh`` (axes 'd', 't') the bit matrix is
    sharded over target words on 't', the read batch over 'd', and the
    whole body runs under shard_map: the gather stays shard-local and
    each shard compacts its own candidates before the tiny packed
    segments are all-gathered and merged on device (_sharded_compact) —
    the SPMD analog of the reference's per-node search + offline merge
    (SURVEY §2.9 P3/P7)."""
    import jax
    import jax.numpy as jnp

    def step(bits_ext, loc, nkmers, cmin, tmin, sizes_pos):
        """bits_ext [S_total+1, W] uint32 (last row all-zero sentinel);
        loc [B, K, nb, h] int32 (padding lanes point at the sentinel;
        blocks stacked row-wise with offsets already added);
        nkmers [B] int32; cmin [n_max+1] int32; tmin [T] int32;
        sizes_pos [T] bool (real targets).  T = nb * W * 32.
        Returns concat([n_cand, idx[C], cnt[C]]) int32."""
        rows = jnp.take(bits_ext, loc, axis=0)  # [B,K,nb,h,W]
        acc = rows[..., 0, :]
        for j in range(1, num_hashes):
            acc = acc & rows[..., j, :]
        # acc: [B,K,nb,W] -> k-major [K, B, nb*W] for the CSA contraction
        B, K, nb, W = acc.shape
        counts = _unpack_count(
            acc.transpose(1, 0, 2, 3).reshape(K, B, nb * W)
        )  # [B, nb*W*32] == [B,T]
        c_thresh = jnp.take(cmin, nkmers, axis=0)[:, None]  # [B,1]
        ok = (
            (counts >= c_thresh)
            & (counts >= tmin[None, :])
            & sizes_pos[None, :]
        )
        idx, cnt, n_cand = _compact_candidates(ok, counts, cand_budget, -1)
        out = jnp.concatenate([n_cand[None], idx, cnt])
        return out

    if mesh is None:
        return jax.jit(step)

    from jax import lax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    d_size = mesh.shape["d"]
    t_size = mesh.shape["t"]

    def local(bits_l, loc_l, nk_l, bval_l, cmin, tmin, sizes_pos):
        rows = jnp.take(bits_l, loc_l, axis=0)  # [B_d,K,nb,h,W_t]
        acc = rows[..., 0, :]
        for j in range(1, num_hashes):
            acc = acc & rows[..., j, :]
        B_d, K, nb, W_t = acc.shape
        counts = _unpack_count(
            acc.transpose(1, 0, 2, 3).reshape(K, B_d, nb * W_t)
        )  # [B_d,T_l]
        di = lax.axis_index("d")
        tg = _global_target_ids(nb, W_t, t_size, lax.axis_index("t"))
        c_thresh = jnp.take(cmin, nk_l, axis=0)[:, None]
        ok = (
            (counts >= c_thresh)
            & (counts >= jnp.take(tmin, tg)[None, :])
            & jnp.take(sizes_pos, tg)[None, :]
            & bval_l[:, None]
        )
        T = nb * W_t * t_size * 32
        return _sharded_compact(
            counts, ok, tg, T, B_d * d_size, B_d, di, cand_budget
        )

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, "t"), P("d", None, None, None), P("d"), P("d"),
            P(), P(), P(),
        ),
        out_specs=P(),
        check_vma=False,
    )

    def wrapper(bits_ext, loc, nkmers, cmin, tmin, sizes_pos):
        B = loc.shape[0]
        B_pad = -(-B // d_size) * d_size
        bval = jnp.arange(B_pad) < B
        if B_pad != B:
            # pad lanes point at the sentinel row; bval masks them out
            sent = bits_ext.shape[0] - 1
            loc = jnp.pad(
                loc, ((0, B_pad - B), (0, 0), (0, 0), (0, 0)),
                constant_values=sent,
            )
            nkmers = jnp.pad(nkmers, (0, B_pad - B))
        return sharded(bits_ext, loc, nkmers, bval, cmin, tmin, sizes_pos)

    return jax.jit(wrapper)


def _stack_blocks(db):
    """Stack a DB's blocks into one [S_total+1, W] matrix (+ sentinel row)
    with flattened per-target metadata; returns
    (stacked_ext, names, indices, gsizes, sizes, total_rows, w)."""
    blocks = db.blocks
    w_max = max(b.bits.shape[1] for b in blocks)
    mats = []
    names: list[str] = []
    indices: list[int] = []
    gsizes: list[int] = []
    sizes: list[int] = []
    row_offsets: list[int] = []
    row_off = 0
    for b in blocks:
        row_offsets.append(row_off)
        m = np.asarray(b.bits)
        if m.shape[1] < w_max:
            m = np.pad(m, ((0, 0), (0, w_max - m.shape[1])))
        mats.append(m)
        row_off += m.shape[0]
        names.extend(b.meta.names)
        indices.extend(b.meta.indices)
        gsizes.extend(b.meta.gsizes)
        sizes.extend(b.meta.sizes)
        pad = w_max * 32 - b.meta.num_targets
        if pad:
            names.extend([""] * pad)
            indices.extend([0] * pad)
            gsizes.extend([0] * pad)
            sizes.extend([0] * pad)
    stacked = np.concatenate(mats, axis=0)
    stacked = np.concatenate(
        [stacked, np.zeros((1, w_max), dtype=np.uint32)], axis=0
    )
    return stacked, names, indices, gsizes, sizes, row_off, w_max, row_offsets


class HostDB:
    """Pure-host backend with the DeviceDB interface: C++ hashing + C++
    sparse-bit match counting + exact integer thresholds.  Used when no
    accelerator is available (or the tunnel to it is unhealthy); output
    layout matches the device step so the streaming writer is shared."""

    def __init__(self, db, opt):
        from ..kmer import native

        if native.get_lib() is None:
            raise RuntimeError("host backend requires the native library")
        self.db = db
        self.opt = opt
        self.mesh = None
        (stacked, names, indices, gsizes, sizes, rows, w, row_offsets) = (
            _stack_blocks(db)
        )
        self.n_blocks = len(db.blocks)
        self.block_row_offset = row_offsets
        self.block_num_sigs = [b.meta.num_sigs for b in db.blocks]
        self.bits_ext_np = stacked
        self.total_rows = rows
        self.sentinel = rows
        self.w = w
        self.t_per_block = w * 32
        self.names = names
        self.indices = np.asarray(indices, dtype=np.int64)
        self.gsizes = np.asarray(gsizes, dtype=np.int64)
        self.sizes = np.asarray(sizes, dtype=np.int64)
        self.sizes_pos_np = self.sizes > 0
        self._tmin_np = build_tmin_table(
            self.sizes.astype(np.float64), opt.min_target_cov
        )
        self._cmin_np: dict[int, np.ndarray] = {}
        # per-block union screens (large-T block skip; native extension);
        # KMCP_TPU_NO_SCREEN=1 ignores them (A/B benchmarking)
        from ..index.format import read_block_union

        if os.environ.get("KMCP_TPU_NO_SCREEN"):
            self.block_unions = [None] * self.n_blocks
        else:
            self.block_unions = [
                read_block_union(db.path, b) for b in range(self.n_blocks)
            ]
        self.has_screen = any(u is not None for u in self.block_unions)
        # packed union table (uniform geometry): ONE u64 mod per k-mer
        # probes every block's screen via the AVX2 count kernel instead
        # of n_blocks mod+test passes — isolated probe cost 0.55 s vs
        # 0.03 s per 8k reads at 256 blocks (1M targets)
        self.packed_union = (
            build_packed_union(db, self.n_blocks)
            if self.has_screen and self.n_blocks > 1
            else None
        )

    def _cmin(self, n_max: int) -> np.ndarray:
        n_max = max(64, -(-n_max // 64) * 64)
        t = self._cmin_np.get(n_max)
        if t is None:
            t = build_cmin_table(
                n_max, self.opt.min_kmers, self.opt.min_query_cov,
                self.opt.max_fpr, self.db.query_fpr,
            )
            self._cmin_np[n_max] = t
        return t

    def _hash_batch(self, seqs, k, kmax, dedup_threshold=0, minimizer_w=0,
                    syncmer_s=0):
        from ..kmer import native

        out, counts = native.hash_reads_padded(
            seqs, k, kmax, canonical=self.db.info.canonical,
            max_hash=self.db.max_hash, dedup_threshold=dedup_threshold,
            minimizer_w=minimizer_w, syncmer_s=syncmer_s,
        )
        return out, None, counts

    def search_reads_async(self, reads_u8, lens, cand_budget, seqs=None,
                           dedup_threshold=0, eff_lens=None, mates=None):
        """Synchronous host implementation returning the device-compatible
        packed int32 array [1 + C + C + B].

        ``dedup_threshold`` > 0 enables in-kernel per-read deduplication
        of large k-mer sets (reference util-db-search.go:874-908), so
        such reads need no slow-path fallback.  ``eff_lens`` overrides
        the per-read lengths used for the min-query-length filter (for
        paired reads: max(len1, len2), while ``lens`` sizes the joined
        hash rows).  ``mates`` (an interleaved [m1_0, m2_0, m1_1, ...]
        list of 2B sequences) hashes each mate as its own row — sketch
        selection windows must not cross the mate junction
        (engine.py:408-414) — and merges row pairs by reshape; the
        combined k-mer multiset then matches the reference's
        concatenation of per-mate sketches (util-db-search.go:800-805).
        Callers pass dedup_threshold=0 with mates (per-row in-kernel
        dedup cannot deduplicate across a pair)."""
        from ..kmer import native

        opt = self.opt
        db = self.db
        k = sorted(db.info.ks)[-1]
        B, L = reads_u8 if isinstance(reads_u8, tuple) else reads_u8.shape
        kmax = L - k + 1
        if mates is not None:
            dedup_threshold = 0
            kmax_m = max(max(len(s) for s in mates) - k + 1, 1)
        if seqs is None:
            seqs = [bytes(reads_u8[i, : lens[i]]) for i in range(B)]
        h = db.info.num_hashes
        mw = db.info.minimizer_w if db.info.minimizer else 0
        ss = db.info.syncmer_s if db.info.syncmer else 0

        lib = native.get_lib()
        sparse = lib is not None and hasattr(lib, "kt_count_hashes_sparse")
        T_total = self.n_blocks * self.t_per_block

        # per-read / per-target integer thresholds (exact float64
        # pre-computation; see module docstring).  INT32_MAX marks
        # excluded reads / padding target lanes for the sparse kernel.
        def read_thresholds(nkmers):
            cmin = self._cmin(int(nkmers.max(initial=1)))
            cmin_r = cmin[np.minimum(nkmers, len(cmin) - 1)].astype(
                np.int32
            )
            len_ok = np.asarray(
                eff_lens if eff_lens is not None else lens
            ) >= opt.min_query_len
            excl = ~len_ok
            if dedup_threshold <= 0:
                # without in-kernel dedup, over-threshold reads fall
                # back to the object engine upstream
                excl |= nkmers > opt.kmer_dedup_threshold
            cmin_r[excl] = np.iinfo(np.int32).max
            return cmin_r, len_ok

        def tmin_eff():
            t = getattr(self, "_tmin_eff_np", None)
            if t is None:
                t = np.where(
                    self.sizes_pos_np,
                    np.maximum(self._tmin_np, 1),
                    np.iinfo(np.int32).max,
                ).astype(np.int32)
                self._tmin_eff_np = t
            return t

        ucnt_state: dict = {}

        def screen_active(b, hashes, nk):
            """Union-screen activity mask for block b, or None: a read
            passes only when its union-bloom hit count clears the
            junk-FP band (mean fpr_u*n + 3 sigma; index/build.py
            _write_union_screen).  With the packed union table, one
            hash+count pass computed lazily per batch serves every
            block."""
            u = self.block_unions[b]
            if u is None:
                return None
            words, num_bits, fpr_u = u
            uc = None
            if self.packed_union is not None:
                if "mat" not in ucnt_state:
                    U, nbits, _f = self.packed_union
                    loc_u = native.locations(hashes, 1, nbits)
                    if loc_u is None:
                        ucnt_state["mat"] = None
                    else:
                        loc_u[hashes[..., None] == 0] = np.int32(nbits)
                        ucnt_state["mat"] = native.count_block(
                            U, loc_u, 1
                        )
                if ucnt_state["mat"] is not None:
                    uc = ucnt_state["mat"][:, b]
            if uc is None:
                uc = native.union_count(words, num_bits, hashes)
            if uc is None:
                return None
            theta = np.maximum(
                opt.min_kmers,
                np.ceil(
                    fpr_u * nk + 3.0 * np.sqrt(nk * fpr_u * (1 - fpr_u))
                ),
            )
            return (uc >= theta).astype(np.uint8)

        if self.n_blocks == 1:
            if mates is not None:
                # [2B, kmax_m, h] -> [B, 2*kmax_m, h]: row pairs are
                # adjacent in memory, so the merge is a free reshape
                loc2, c2 = native.hash_reads_loc(
                    mates, k, kmax_m, self.total_rows, h,
                    canonical=db.info.canonical, max_hash=db.max_hash,
                    minimizer_w=mw, syncmer_s=ss,
                )
                loc = loc2.reshape(B, 2 * kmax_m, h)
                counts_per_read = c2.reshape(B, 2).sum(axis=1)
            else:
                loc, counts_per_read = native.hash_reads_loc(
                    seqs, k, kmax, self.total_rows, h,
                    canonical=db.info.canonical, max_hash=db.max_hash,
                    dedup_threshold=dedup_threshold, minimizer_w=mw,
                    syncmer_s=ss,
                )
            nkmers = counts_per_read.astype(np.int32)
            if sparse:
                cmin_r, _ = read_thresholds(nkmers)
                idx_out = np.empty(cand_budget, dtype=np.int64)
                cnt_out = np.empty(cand_budget, dtype=np.int32)
                n_cand = native.count_block_sparse(
                    self.bits_ext_np, loc, h, cmin_r, tmin_eff(),
                    0, T_total, cand_budget, idx_out, cnt_out, 0,
                )
                return self._pack_sparse(
                    n_cand, idx_out, cnt_out, nkmers, cand_budget, B
                )
            counts = native.count_block(self.bits_ext_np, loc, h)
        else:
            # multi-block: hash once, derive per-block row offsets, count
            # each block into its slice of the global target space
            if mates is not None:
                h2, _, c2 = self._hash_batch(
                    mates, k, kmax_m, minimizer_w=mw, syncmer_s=ss,
                )
                hashes = h2.reshape(B, 2 * kmax_m)
                counts_per_read = c2.reshape(B, 2).sum(axis=1)
            else:
                hashes, _, counts_per_read = self._hash_batch(
                    seqs, k, kmax, dedup_threshold=dedup_threshold,
                    minimizer_w=mw, syncmer_s=ss,
                )
            nkmers = counts_per_read.astype(np.int32)
            nk = counts_per_read.astype(np.float64)
            if sparse:
                # fused per-block count+threshold+compaction: the dense
                # [B, T] count/threshold arrays never materialize (the
                # NumPy pass over them dominated beyond ~10k targets)
                cmin_r, _ = read_thresholds(nkmers)
                idx_out = np.empty(cand_budget, dtype=np.int64)
                cnt_out = np.empty(cand_budget, dtype=np.int32)
                te = tmin_eff()
                hashes_c = np.ascontiguousarray(hashes, dtype=np.uint64)
                n_cand = 0
                for b in range(self.n_blocks):
                    # locations derive in-kernel (hash 0 = padding lane)
                    t_off = b * self.t_per_block
                    n_cand = native.count_hashes_sparse(
                        self.bits_ext_np, hashes_c, h,
                        self.block_num_sigs[b], self.block_row_offset[b],
                        cmin_r, te[t_off : t_off + self.t_per_block],
                        t_off, T_total, cand_budget, idx_out, cnt_out,
                        n_cand, active=screen_active(b, hashes_c, nk),
                    )
                return self._pack_sparse(
                    n_cand, idx_out, cnt_out, nkmers, cand_budget, B
                )
            if not self.has_screen and self.w <= 2:
                # fused single-call path: per-block locations derived
                # and counted in C++ (no per-block Python loop or
                # [B,K,h] intermediates).  Only for NARROW blocks (the
                # reference's 8/32-target layout, w <= 2 words): its
                # scalar per-word walk recomputes the location per word,
                # which loses to the AVX2 path on wide blocks
                counts = native.count_blocks(
                    self.bits_ext_np, hashes, h,
                    np.asarray(self.block_row_offset, dtype=np.int64),
                    np.asarray(self.block_num_sigs, dtype=np.uint64),
                )
            else:
                parts = []
                for b in range(self.n_blocks):
                    s_b = self.block_num_sigs[b]
                    loc_b = native.locations(hashes, h, s_b)
                    loc_b = loc_b + np.int32(self.block_row_offset[b])
                    loc_b[hashes == 0] = np.int32(self.sentinel)
                    parts.append(
                        native.count_block(
                            self.bits_ext_np, loc_b, h,
                            active=screen_active(b, hashes, nk),
                        )
                    )
                counts = np.concatenate(parts, axis=1)
        # dense fallback (old native builds without the sparse kernel)
        cmin = self._cmin(int(nkmers.max(initial=1)))
        c_thresh = cmin[np.minimum(nkmers, len(cmin) - 1)][:, None]
        len_ok = np.asarray(
            eff_lens if eff_lens is not None else lens
        ) >= opt.min_query_len
        ok = (
            (counts >= c_thresh)
            & (counts >= self._tmin_np[None, :])
            & self.sizes_pos_np[None, :]
            & len_ok[:, None]
        )
        if dedup_threshold <= 0:
            ok &= (nkmers <= opt.kmer_dedup_threshold)[:, None]
        flat = np.nonzero(ok.reshape(-1))[0]
        n_cand = len(flat)
        out = np.empty(1 + 2 * cand_budget + B, dtype=np.int64)
        out[0] = n_cand
        ncap = min(n_cand, cand_budget)
        out[1 : 1 + ncap] = flat[:ncap]
        out[1 + cand_budget : 1 + cand_budget + ncap] = counts.reshape(-1)[
            flat[:ncap]
        ]
        out[1 + 2 * cand_budget :] = nkmers
        return out

    @staticmethod
    def _pack_sparse(n_cand, idx_out, cnt_out, nkmers, cand_budget, B):
        out = np.empty(1 + 2 * cand_budget + B, dtype=np.int64)
        out[0] = n_cand
        ncap = min(n_cand, cand_budget)
        out[1 : 1 + ncap] = idx_out[:ncap]
        out[1 + cand_budget : 1 + cand_budget + ncap] = cnt_out[:ncap]
        out[1 + 2 * cand_budget :] = nkmers
        return out


class DeviceDB:
    """Device-resident single-group bit matrix for the fast path.

    Usable when the DB's blocks share one word-width after padding and the
    total rows fit HBM; blocks are stacked row-wise with per-block row
    offsets folded into the location computation by the C++ hasher (one
    block) or host code (few blocks)."""

    def __init__(self, db, opt, mesh=None):
        import jax
        import jax.numpy as jnp

        enable_compilation_cache()
        self.db = db
        self.opt = opt
        self.mesh = mesh
        blocks = db.blocks
        self.n_blocks = len(blocks)
        w_max = max(b.bits.shape[1] for b in blocks)
        mats = []
        names: list[str] = []
        indices: list[int] = []
        gsizes: list[int] = []
        sizes: list[int] = []
        self.block_row_offset = []
        self.block_t_offset = []
        row_off = 0
        for b in blocks:
            m = np.asarray(b.bits)
            if m.shape[1] < w_max:
                m = np.pad(m, ((0, 0), (0, w_max - m.shape[1])))
            mats.append(m)
            self.block_row_offset.append(row_off)
            row_off += m.shape[0]
            names.extend(b.meta.names)
            indices.extend(b.meta.indices)
            gsizes.extend(b.meta.gsizes)
            # per-block target list padded to w_max*32 lanes
            pad = w_max * 32 - b.meta.num_targets
            sizes.extend(b.meta.sizes)
            if pad:
                names.extend([""] * pad)
                indices.extend([0] * pad)
                gsizes.extend([0] * pad)
                sizes.extend([0] * pad)
        self.total_rows = row_off
        if mesh is not None and self.n_blocks > 1:
            # sharded multi-block layout: uniform-geometry blocks stack
            # COLUMN-wise so mesh axis 't' shards whole blocks and one
            # modulus (rows = S_b) serves every shard — the screened
            # composition of SURVEY P3 (_make_screened_step_sharded)
            if len({m.shape for m in mats}) != 1:
                raise ValueError(
                    "sharded multi-block DeviceDB needs uniform block "
                    "geometry (index --uniform-sigs)"
                )
            if self.n_blocks % mesh.shape["t"]:
                raise ValueError(
                    f"{self.n_blocks} blocks do not divide the 't' axis "
                    f"({mesh.shape['t']})"
                )
            stacked = np.concatenate(mats, axis=1)
            self.total_rows = mats[0].shape[0]
        else:
            stacked = np.concatenate(mats, axis=0)
        if mesh is not None and self.n_blocks == 1:
            # pad word axis so the 't' shard axis divides it evenly
            t_shards = mesh.shape["t"]
            pad_w = (-stacked.shape[1]) % t_shards
            if pad_w:
                stacked = np.pad(stacked, ((0, 0), (0, pad_w)))
                w_max += pad_w
                names.extend([""] * (pad_w * 32))
                indices.extend([0] * (pad_w * 32))
                gsizes.extend([0] * (pad_w * 32))
                sizes.extend([0] * (pad_w * 32))
        stacked = np.concatenate(
            [stacked, np.zeros((1, stacked.shape[1]), dtype=np.uint32)],
            axis=0,
        )  # sentinel row
        self.w = w_max
        self.t_per_block = w_max * 32
        self.sentinel = self.total_rows
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dev = NamedSharding(mesh, P(None, "t"))
            repl = NamedSharding(mesh, P())
        else:
            dev = jax.devices()[0]
            repl = dev
        self.bits_ext = jax.device_put(jnp.asarray(stacked), dev)
        self.names = names
        self.indices = np.asarray(indices, dtype=np.int64)
        self.gsizes = np.asarray(gsizes, dtype=np.int64)
        self.sizes = np.asarray(sizes, dtype=np.int64)
        self.sizes_pos_np = self.sizes > 0
        self.sizes_pos = jax.device_put(jnp.asarray(self.sizes_pos_np), repl)
        self._tmin_np = build_tmin_table(
            self.sizes.astype(np.float64), opt.min_target_cov
        )
        self._tmin = jax.device_put(jnp.asarray(self._tmin_np), repl)
        self._perm_tabs = None  # bit-major (tmin, sizes_pos) for pallas_count
        self._bits6 = None  # per-block VMEM slabs for the pair kernel
        self._cmin_cache: dict[int, object] = {}
        self._dev = repl
        # two-pass block screen (multi-block wide DBs; _make_screened_tail
        # single-device, _make_screened_step_sharded on a mesh)
        self.screen = None
        if self.n_blocks > 1 and db.info.num_hashes == 1:
            self.screen = self._load_screen(db)
        if mesh is not None and self.n_blocks > 1 and self.screen is None:
            raise ValueError(
                "sharded multi-block DeviceDB needs the block screen "
                "(index --block-screen --uniform-sigs)"
            )

    def _load_screen(self, db):
        """Packed block-union table for the device two-pass search, or
        None: U[r, g//32] bit g%32 = row r set in block g's union Bloom
        (index --block-screen artifacts; one shared modulus requires
        equal union sizes — uniformly-chunked DBs satisfy this)."""
        import jax
        import jax.numpy as jnp

        if os.environ.get("KMCP_TPU_NO_SCREEN"):
            return None
        packed = build_packed_union(db, self.n_blocks)
        if packed is None:
            return None
        U, nb_u, fprs = packed
        return {
            "u_ext": jax.device_put(jnp.asarray(U), self._dev),
            "num_bits": nb_u,
            "fprs": fprs,
            "theta": {},
            "s_block": int(db.blocks[0].bits.shape[0]),
        }

    def _theta_for(self, n_max: int):
        """[nb, n_max+1] int32 screen thresholds — the same float64
        junk-FP band as HostDB.screen_active (mean + 3 sigma of the
        union Bloom's per-read false-positive count)."""
        import jax
        import jax.numpy as jnp

        n_max = max(64, -(-n_max // 64) * 64)
        t = self.screen["theta"].get(n_max)
        if t is None:
            n = np.arange(n_max + 1, dtype=np.float64)
            f = self.screen["fprs"][:, None]
            th = np.maximum(
                float(self.opt.min_kmers),
                np.ceil(f * n + 3.0 * np.sqrt(n * f * (1.0 - f))),
            ).astype(np.int32)
            t = jax.device_put(jnp.asarray(th), self._dev)
            self.screen["theta"][n_max] = t
        return t

    def cmin_for(self, n_max: int):
        import jax
        import jax.numpy as jnp

        # bucket n_max to limit table variants
        n_max = max(64, -(-n_max // 64) * 64)
        t = self._cmin_cache.get(n_max)
        if t is None:
            tbl = build_cmin_table(
                n_max,
                self.opt.min_kmers,
                self.opt.min_query_cov,
                self.opt.max_fpr,
                self.db.query_fpr,
            )
            t = jax.device_put(jnp.asarray(tbl), self._dev)
            self._cmin_cache[n_max] = t
        return t

    def search_reads_pallas(self, reads_u8, lens, cand_budget,
                            dedup_values: bool = False,
                            packed4: bool = False):
        """Pallas rolling-hash kernel + jitted count tail (num_hashes==1).

        reads_u8: [B, lmax] uint8 (B multiple of 256); the kernel's
        [L, B] layout is produced by a device-side transpose.  Returns
        (meta int32, aux uint16) — see _make_count_tail.

        With ``dedup_values`` the hash kernel also emits the 64-bit
        window values and reads over the dedup threshold are uniqued on
        device (_dedup_value_planes) instead of excluded — the paired
        streaming mode, whose joined mate rows routinely exceed the
        256-k-mer threshold (util-db-search.go:800-805,874-908).  For
        paired reads callers pass max(len1, len2) as ``lens`` (it only
        feeds the min-query-length filter).

        With ``packed4`` reads_u8 is the [B, lmax//2] 4-bit-packed
        layout (native.pack_rows_4bit) — half the H2D bytes; decoded
        on device ahead of the hash kernel."""
        import jax.numpy as jnp

        from .pallas_hash import make_pallas_hash_loc

        opt = self.opt
        db = self.db
        assert self.mesh is None
        h = db.info.num_hashes
        k = sorted(db.info.ks)[-1]
        lmax = reads_u8.shape[1] * (2 if packed4 else 1)
        max_hash = (
            int(db.max_hash) if db.max_hash is not None else (1 << 64) - 1
        )
        if self.n_blocks > 1:
            if self.screen is None:
                raise RuntimeError(
                    "multi-block device search needs the two-pass screen "
                    "(index --block-screen with uniform block geometry)"
                )
            return self._search_reads_screened(
                reads_u8, lens, cand_budget, k, lmax, max_hash,
                dedup_values=dedup_values, packed4=packed4,
            )
        hash_fn = make_pallas_hash_loc(
            k, lmax, self.total_rows, max_hash, num_hashes=h,
            emit_values=dedup_values, packed4=packed4,
        )
        outs = hash_fn(reads_u8)
        loc_ts, nk = outs[:h], outs[h]
        vplanes = tuple(outs[h + 1 : h + 3]) if dedup_values else ()
        B = reads_u8.shape[0]
        K = lmax - k + 1
        S_ext = self.total_rows + 1
        pc = _pc_mode(h, self.w, S_ext)
        if pc and h > 1 and not pc.endswith("mask"):
            pc = None  # h>1 rides the fused-threshold mask tails only
        if pc:
            # reads per grid step: the resident kernel fixes its own R;
            # the ring kernel tiles full VPU lanes on narrow rows.  Odd
            # batch sizes keep the XLA tail.
            if pc.endswith(("resident", "mask")) and not pc.endswith(
                "ring-mask"
            ):
                pc_R = 2
            else:
                pc_R = max(1, 128 // (self.w // 8))
            if B % pc_R:
                pc = None
        pc_cfg = (K, self.w, pc, S_ext, h) if pc else None
        # chunk wide-T batches so the big intermediate stays bounded:
        # [B_c, K, W] gathered rows on the XLA path (~600 MB), the
        # [B_c, 32*W] count matrix on the fused-Pallas path (the kernel
        # never materializes the gathered rows)
        n_chunks = 1
        if h == 1 or pc:
            # mask mode only READS the counts array sparsely (the tail
            # scans packed words), so its chunk bound is HBM capacity,
            # not XLA temporaries
            if pc and pc.endswith("mask"):
                limit = 600_000_000
            elif pc:
                limit = 128_000_000
            else:
                limit = 150_000_000
            per_read = 32 * self.w if pc else K * self.w
            # pallas kernels hold the whole chunk's loc (+cthr) table
            # in SMEM (1 MB, minor dim padded to 128-lane multiples):
            # cap chunk reads accordingly
            k_pad = -(-(K * h + 1) // 128) * 128
            smem_rows = 800_000 // (4 * k_pad) if pc else B
            while (
                (
                    (B // n_chunks) * per_read > limit
                    or B // n_chunks > smem_rows
                )
                and n_chunks < B
                and B % (n_chunks * 2) == 0
                and (not pc or (B // (n_chunks * 2)) % pc_R == 0)
            ):
                n_chunks *= 2
        tail = _make_count_tail(
            cand_budget, opt.min_query_len, opt.kmer_dedup_threshold,
            n_chunks, pc_cfg, in_dedup=dedup_values,
        )
        n_win = lmax - k + 1
        cmin = self.cmin_for(max(n_win, 1))
        tmin, spos = (
            self._bitmajor_tabs() if pc else (self._tmin, self.sizes_pos)
        )
        if isinstance(lens, np.ndarray) or not hasattr(lens, "dtype"):
            # one H2D per batch; callers re-stepping the same batch
            # (bench reps, overflow retries) pass a device array to skip
            # the tunnel round-trip
            lens = jnp.asarray(np.asarray(lens).astype(np.int32))
        bits = (
            self._bits_resident()
            if pc
            and pc.endswith(("resident", "mask"))
            and not pc.endswith("ring-mask")
            else self.bits_ext
        )
        return tail(
            bits, tuple(loc_ts), nk, lens,
            cmin, tmin, spos, vplanes,
        )

    def _bits_resident(self):
        """Prepacked [n_rg, n_tiles, rows_g+1, 8, tl] slabs for the
        VMEM-resident count kernel (one-time device-side shuffle,
        pallas_count.pack_resident)."""
        if getattr(self, "_bits5d", None) is None:
            from .pallas_count import pack_resident, resident_geometry

            geo = resident_geometry(self.total_rows + 1, self.w)
            self._bits5d = pack_resident(self.bits_ext, *geo)
        return self._bits5d

    def _bitmajor_tabs(self):
        """(tmin, sizes_pos) permuted into the Pallas count kernel's
        bit-major lane layout (pallas_count.perm_t_of_p)."""
        if self._perm_tabs is None:
            import jax
            import jax.numpy as jnp

            from .pallas_count import perm_t_of_p

            perm = perm_t_of_p(self.w)
            self._perm_tabs = (
                jax.device_put(jnp.asarray(self._tmin_np[perm]), self._dev),
                jax.device_put(
                    jnp.asarray(self.sizes_pos_np[perm]), self._dev
                ),
            )
        return self._perm_tabs

    def _pair_slabs(self):
        """Per-block [nb, S8, 8, 128] VMEM slab packing of the stacked
        bit matrix for the screened pair kernel (pack_pair_blocks);
        built once, lives on device."""
        if self._bits6 is None:
            from .pallas_count import pack_pair_blocks

            self._bits6 = pack_pair_blocks(
                self.bits_ext, self.n_blocks, self.screen["s_block"]
            )
        return self._bits6

    def _search_reads_screened(
        self, reads_u8, lens, cand_budget, k, lmax, max_hash,
        interpret=False, dedup_values=False, packed4=False,
    ):
        """Two-pass screened search of a multi-block DB (the GTDB-scale
        wide-T regime); see _make_screened_tail.  ``dedup_values``: the
        paired streaming mode — window values ride along and over-
        threshold joined rows are uniqued in-step before both passes."""
        import jax.numpy as jnp

        from .pallas_hash import make_pallas_hash_loc

        opt = self.opt
        screen = self.screen
        s_block = screen["s_block"]
        hash_fn = make_pallas_hash_loc(
            k, lmax, s_block, max_hash, num_hashes=1,
            screen_sigs=screen["num_bits"], interpret=interpret,
            emit_values=dedup_values, packed4=packed4,
        )
        outs = hash_fn(reads_u8)
        loc_t, locu_t, nk = outs[:3]
        vplanes = tuple(outs[3:5]) if dedup_values else ()
        B = reads_u8.shape[0]
        K = lmax - k + 1
        pair_budget = min(B * self.n_blocks, max(256, 2 * cand_budget))
        pair_mode = _pair_pc_mode(
            self.t_per_block, s_block, self.n_blocks
        )
        if pair_mode:
            # block-stationary Mosaic pass 2: no [P_c, K, W] gathered
            # intermediate exists, so no pair chunking either; the pair
            # count must divide the kernel's pairs-per-step grid
            pair_budget = -(-pair_budget // 8) * 8
            tail = _make_screened_tail(
                cand_budget, pair_budget, opt.min_query_len,
                opt.kmer_dedup_threshold, self.n_blocks,
                self.t_per_block, s_block, 1,
                pair_pc=(K, pair_mode == "interpret" or interpret),
                in_dedup=dedup_values,
            )
            bits_arg = self._pair_slabs()
        else:
            n_chunks = 1
            while (
                (pair_budget // n_chunks) * K * self.w > 150_000_000
                and n_chunks < pair_budget
            ):
                n_chunks *= 2
            pair_budget = -(-pair_budget // n_chunks) * n_chunks
            tail = _make_screened_tail(
                cand_budget, pair_budget, opt.min_query_len,
                opt.kmer_dedup_threshold, self.n_blocks,
                self.t_per_block, s_block, n_chunks,
                in_dedup=dedup_values,
            )
            bits_arg = self.bits_ext
        cmin = self.cmin_for(max(K, 1))
        theta = self._theta_for(max(K, 1))
        if isinstance(lens, np.ndarray) or not hasattr(lens, "dtype"):
            lens = jnp.asarray(np.asarray(lens).astype(np.int32))
        return tail(
            bits_arg, screen["u_ext"], loc_t, locu_t, nk, lens,
            cmin, theta, self._tmin, self.sizes_pos, vplanes,
        )

    def search_reads_async(
        self,
        reads_u8: np.ndarray,
        lens: np.ndarray,
        cand_budget: int,
        paired_dedup: bool = False,
    ):
        """Dispatch the fused reads->matches step (hashing on device).
        ``paired_dedup``: in-step >threshold k-mer dedup for joined
        paired rows (see _make_read_search_step); pass max(len1, len2)
        as ``lens`` then."""
        import jax.numpy as jnp

        opt = self.opt
        db = self.db
        k = sorted(db.info.ks)[-1]
        step = _make_read_search_step(
            k,
            db.info.num_hashes,
            cand_budget,
            int(db.max_hash) if db.max_hash is not None else (1 << 64) - 1,
            opt.min_query_len,
            opt.kmer_dedup_threshold,
            self.mesh,
            paired_dedup,
        )
        n_win_max = reads_u8.shape[1] - k + 1
        cmin = self.cmin_for(max(n_win_max, 1))
        return step(
            self.bits_ext,
            jnp.asarray(reads_u8),
            jnp.asarray(lens.astype(np.int32)),
            cmin,
            self._tmin,
            self.sizes_pos,
        )

    def search_screened_sharded(
        self,
        loc: np.ndarray,
        loc_u: np.ndarray,
        nkmers: np.ndarray,
        lens: np.ndarray,
        cand_budget: int,
    ):
        """Dispatch the sharded two-pass screened step (multi-block mesh
        layout).  loc/loc_u: [B, K] int32 host-computed location planes,
        sentinels = s_block / union num_bits."""
        import jax.numpy as jnp

        assert self.mesh is not None and self.screen is not None
        step = _make_screened_step_sharded(
            cand_budget,
            max(256, 2 * cand_budget),
            self.opt.min_query_len,
            self.opt.kmer_dedup_threshold,
            self.n_blocks,
            self.t_per_block,
            self.total_rows,
            self.mesh,
        )
        K = loc.shape[1]
        cmin = self.cmin_for(max(int(K), 1))
        theta = self._theta_for(max(int(K), 1))
        return step(
            self.bits_ext, self.screen["u_ext"],
            jnp.asarray(loc.astype(np.int32)),
            jnp.asarray(loc_u.astype(np.int32)),
            jnp.asarray(np.minimum(nkmers, 10**9).astype(np.int32)),
            jnp.asarray(np.asarray(lens).astype(np.int32)),
            cmin, theta, self._tmin, self.sizes_pos,
        )

    def search_async(self, loc: np.ndarray, nkmers: np.ndarray, cand_budget: int):
        """Dispatch one batch; returns the device array (pull later).

        loc: [B, K, h] (single block) or [B, K, nb, h] int32.
        """
        import jax.numpy as jnp

        num_hashes = self.db.info.num_hashes
        if loc.ndim == 3:
            loc = loc.reshape(loc.shape[0], loc.shape[1], 1, num_hashes)
        step = _make_search_step(num_hashes, cand_budget, self.mesh)
        cmin = self.cmin_for(int(nkmers.max(initial=1)))
        return step(
            self.bits_ext,
            jnp.asarray(loc),
            jnp.asarray(np.minimum(nkmers, 10**9).astype(np.int32)),
            cmin,
            self._tmin,
            self.sizes_pos,
        )
