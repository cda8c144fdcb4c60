"""Pallas TPU kernel: fused Bloom-row gather + positional popcount.

The search hot loop's count core — the reference's pospop positional
popcount (/root/reference/kmcp/cmd/util-db-search.go:6728 calls
shenwei356/pospop.Count8) fused with the row gather that feeds it
(row slices at `offset0 + h mod numSigs`, :6810-6816) — as one Mosaic
kernel.  Per read, the K Bloom rows named by the hash locations are
DMA'd HBM->VMEM through an N-slot ring (the gather), and a statically
unrolled Harley-Seal carry-save tree accumulates per-bit-position
match counts entirely on chip, so the gathered rows never round-trip
through HBM.  The XLA formulation (device.py::_unpack_count)
materializes the [K, B, W] gathered-rows intermediate; measured
113 GB/s of 819 GB/s HBM on wide rows — this kernel's row DMAs are
the only HBM reads.

Counter structure (same scheme as the reference's pospop assembly,
mapped to 32-bit VPU lanes): groups of 16 planes collapse through a
15-CSA tree into one weight-16 plane while ones/twos/fours/eights
residues chain across groups; the weight-16 planes feed a half-adder
binary counter whose carry depth is STATICALLY bounded by the group
index (a carry into level l needs >= 2^l planes), so the whole
contraction unrolls to ~6 VPU ops per k-mer plane and only
~log2(K) + 4 planes pay the final 32-way bit-unpack.

Counts leave in the BIT-MAJOR layout counts[b, j*W + w] = matched
k-mers of target t = w*32 + j (the unpack then never crosses lanes).
Callers threshold with permuted tmin/sizes tables and remap candidate
indices after compaction; output ordering is normalized downstream by
the stream layer's lexsort over (t, size, -cnt, qi) (stream.py:513),
so the permuted compaction order is invisible in the TSV.

Multi-hash DBs fuse the pand row-AND (util-db-search.go:6639-6645)
into the same kernel: each k-mer's ``num_hashes`` Bloom rows are
gathered and ANDed in VMEM before the plane enters the CSA tree
(``make_pallas_count(num_hashes=...)``;
test_pallas_count_multihash_pand), so one kernel replaces the
reference's pand+pospop pair for every hash count.
"""

from __future__ import annotations

import functools

import numpy as np


def perm_t_of_p(W: int) -> np.ndarray:
    """Target id t of each bit-major lane p: p = j*W + w -> t = w*32 + j.

    Used to permute per-target threshold tables into the kernel's count
    layout (tab_perm = tab[perm_t_of_p(W)]) and to remap compacted
    candidate lanes back to real target ids."""
    p = np.arange(32 * W)
    return (p % W) * 32 + p // W




def _csa(a, b, c):
    """3:2 compressor; a may be statically zero (None)."""
    if a is None:
        return b ^ c, b & c
    u = a ^ b
    return u ^ c, (a & b) | (u & c)


def _fold_planes(fetch, K: int, on_group_end=None):
    """Harley-Seal carry-save fold of K fetched planes (module
    docstring): returns the weighted plane list [(log2_weight, plane)].
    ``fetch(i)`` yields plane i; ``on_group_end(g)`` fires after each
    16-plane group folds (the ring kernel refills its DMA ring there)."""
    lows = [None, None, None, None]
    upper: list = []
    upper_n = 0

    def insert_upper(c):
        nonlocal upper_n
        upper_n += 1
        l = 0
        while True:
            if l == len(upper):
                upper.append(c)
                return
            a = upper[l]
            upper[l] = a ^ c
            c = a & c
            l += 1
            if upper_n < (1 << l):
                return

    G, tail_n = K // 16, K % 16
    for g in range(G):
        base = g * 16
        x = [fetch(base + ii) for ii in range(16)]
        s16 = None
        e8 = [None, None]
        for half in range(2):
            f4 = [None, None]
            for quarter in range(2):
                t2 = [None, None]
                for pair in range(2):
                    o = half * 8 + quarter * 4 + pair * 2
                    lows[0], t2[pair] = _csa(lows[0], x[o], x[o + 1])
                lows[1], f4[quarter] = _csa(lows[1], t2[0], t2[1])
            lows[2], e8[half] = _csa(lows[2], f4[0], f4[1])
        lows[3], s16 = _csa(lows[3], e8[0], e8[1])
        insert_upper(s16)
        if on_group_end is not None:
            on_group_end(g)
    for t in range(tail_n):
        c = fetch(G * 16 + t)
        cap = (15 if G else 0) + t + 1
        l = 0
        while c is not None:
            if lows[l] is None:
                lows[l] = c
                break
            a = lows[l]
            lows[l] = a ^ c
            c = a & c
            l += 1
            if cap < (1 << l):
                break
            if l == 4:
                insert_upper(c)
                break
    return [
        (l, pl_) for l, pl_ in enumerate(lows) if pl_ is not None
    ] + [(4 + l, pl_) for l, pl_ in enumerate(upper)]


def _unpack_j(planes, j: int, jnp):
    """counts bit-plane j from the weighted plane list: one shift + one
    mask pre-positions each plane's j-bit at its weight."""
    acc = None
    for l, p in planes:
        if j >= l:
            b = (p >> jnp.uint32(j - l)) & jnp.uint32(1 << l)
        else:
            b = (p << jnp.uint32(l - j)) & jnp.uint32(1 << l)
        acc = b if acc is None else acc + b
    return acc


@functools.lru_cache(maxsize=None)
def make_pallas_count(
    K: int, W: int, n_bufs: int = 32, interpret: bool = False,
    masked: bool = False, num_hashes: int = 1,
):
    """Build fn(bits3d uint32 [S_ext, 8, W//8], loc int32 [B, K]) ->
    counts int32 [B, 32*W] in the bit-major layout (module docstring).

    bits3d is the row-stacked bit matrix reshaped (a free view of the
    [S_ext, W] layout); row S_ext-1 is the all-zero sentinel that padding
    lanes point at.  B must be a multiple of the reads-per-step tile
    (128 // (W//8), min 1 — full VPU lanes per op for narrow rows).

    With ``masked`` the call takes (bits3d, loc, cthr [B, 1] i32,
    thr [32, 8, W//8] i32) and also returns a packed candidate bitmask
    [B, W] u32 — the fused-threshold scheme of make_pallas_count_masked
    applied to the DMA-ring gather, serving the production large-S
    geometries whose bit matrix cannot live in VMEM.

    With ``num_hashes`` > 1 the reference's pand row-AND
    (util-db-search.go:6639-6645) fuses in as well: loc arrives as
    [B, K, h], each window's h Bloom rows DMA into the ring slot and
    AND together in VMEM before feeding the popcount fold — the
    gathered rows and their AND never touch HBM.

    SMEM layout note: SMEM windows pad the minor dimension to 128-lane
    multiples, so the location table is FLATTENED to [B, K*h] before
    the kernel and, in masked mode, the per-read cthr rides as one
    extra trailing column instead of its own (heavily padded) [B, 1]
    array."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert W % 8 == 0 and W >= 8
    H = num_hashes
    W8 = W // 8
    R = max(1, 128 // W8)  # reads per grid step
    NB = max(2, min(n_bufs, K))  # DMA ring depth

    def kernel(*refs):
        if masked:
            loc_ref, thr_ref, bits_ref, counts_ref, mask_ref, \
                rowbuf, sems = refs
        else:
            loc_ref, bits_ref, counts_ref, rowbuf, sems = refs
        # loc_ref: SMEM (B, K*h [+1]) int32, unblocked (fetched once;
        # callers chunk the batch to the SMEM budget); the masked
        # variant's trailing column is the per-read cthr floor;
        # bits_ref: HBM/ANY (S_ext, 8, W8);
        # counts_ref: VMEM (R, 32, 8, W8) int32;
        # rowbuf: VMEM (NB, R, h, 8, W8) uint32; sems: DMA (NB, R, h).
        b0 = pl.program_id(0) * R

        def copy(i, r, hj, slot):
            li = loc_ref[b0 + r, i * H + hj]
            return pltpu.make_async_copy(
                bits_ref.at[li],
                rowbuf.at[slot, r, hj],
                sems.at[slot, r, hj],
            )

        def start(i):
            if i < K:
                for r in range(R):
                    for hj in range(H):
                        copy(i, r, hj, i % NB).start()

        def fetch(i):
            slot = i % NB
            for r in range(R):
                for hj in range(H):
                    copy(i, r, hj, slot).wait()
            x = rowbuf[slot, :, 0]  # (R, 8, W8) uint32
            for hj in range(1, H):
                x = x & rowbuf[slot, :, hj]  # fused pand row-AND
            return x

        for i in range(min(NB, K)):
            start(i)

        def refill(g):
            # ring slots of this group are free once folded in; only
            # then may the next DMAs overwrite them (program order is
            # the WAR fence)
            for ii in range(16):
                start(g * 16 + ii + NB)

        # _fold_planes handles group refills; tail fetches refill
        # their own slot
        def fetch_refill(i):
            x = fetch(i)
            if i >= (K // 16) * 16:  # tail plane: refill one slot
                start(i + NB)
            return x

        planes = _fold_planes(fetch_refill, K, on_group_end=refill)
        if masked:
            cthr = jnp.stack(
                [loc_ref[b0 + r, K * H] for r in range(R)]
            )[:, None, None]
        mbits = None
        for j in range(32):
            acc = _unpack_j(planes, j, jnp)
            cnt = acc.astype(jnp.int32)
            counts_ref[:, j] = cnt
            if masked:
                thrj = jnp.maximum(thr_ref[j][None], cthr)
                okj = (cnt >= thrj).astype(jnp.uint32) << jnp.uint32(j)
                mbits = okj if mbits is None else mbits | okj
        if masked:
            mask_ref[:] = mbits

    @jax.jit
    def _run(bits3d, loc, *extra):
        B = loc.shape[0]
        assert B % R == 0, (B, R)
        out_shape = [
            jax.ShapeDtypeStruct((B, 32, 8, W8), jnp.int32),
        ]
        out_specs = [
            pl.BlockSpec(
                (R, 32, 8, W8), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        loc_flat = loc.reshape(B, -1)
        if masked:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((B, 8, W8), jnp.uint32)
            )
            out_specs.append(
                pl.BlockSpec(
                    (R, 8, W8), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            cthr, thr = extra
            loc_flat = jnp.concatenate(
                [loc_flat, cthr.astype(jnp.int32)], axis=1
            )
            extra = (thr,)
        fn_args = (loc_flat, *extra, bits3d)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        fn = pl.pallas_call(
            kernel,
            out_shape=tuple(out_shape),
            grid=(B // R,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=[
                pltpu.VMEM((NB, R, H, 8, W8), jnp.uint32),
                pltpu.SemaphoreType.DMA((NB, R, H)),
            ],
            interpret=interpret,
        )
        outs = fn(*fn_args)
        if masked:
            counts, mask = outs
            return (
                counts.reshape(B, 32 * W), mask.reshape(B, W)
            )
        return outs[0].reshape(B, 32 * W)

    def run(bits3d, loc, *extra):
        return _run(bits3d, loc, *extra)

    run.reads_per_step = R
    return run



def resident_geometry(S_ext: int, W: int, max_groups: int = 8):
    """(n_rg, rows_g, n_tiles, tl) for the VMEM-resident kernel, or None
    when the row count needs more than ``max_groups`` VMEM-sized row
    groups (large-S DBs keep the DMA-ring kernel).  tl is fixed at 128
    lanes (the native VPU tile width; smaller lane tiles pad to 128 in
    VMEM and save nothing), so W must be a multiple of 1024 targets'
    worth of words — same constraint as the ring kernel.

    A single row group holds up to ~3.6k rows (15 MB of 16 MB VMEM —
    the large-T bench geometry fits) and writes counts directly;
    multi-group DBs write per-group partial counts that XLA sums (an
    output block may only be revisited on CONSECUTIVE grid steps, and
    the row-group dim must be outermost so slabs reload per sweep, not
    per step)."""
    TL = 128
    W8 = W // 8
    if W % 8 or W8 % TL:
        return None
    budget = 15_000_000 if S_ext * 8 * TL * 4 <= 15_000_000 else 7_200_000
    rows_g = budget // (8 * TL * 4)
    n_rg = -(-S_ext // rows_g)
    if n_rg > max_groups:
        return None
    rows_g = -(-S_ext // n_rg)
    return n_rg, rows_g, W8 // TL, TL


def pack_resident(bits_ext, n_rg: int, rows_g: int, n_tiles: int, tl: int):
    """[S_ext, W] uint32 -> [n_rg, n_tiles, rows_g+1, 8, tl] slabs, each
    with its own all-zero sentinel row at local index rows_g (out-of-
    group locations remap there).  Runs on device (one-time per DB)."""
    import jax.numpy as jnp

    S_ext, W = bits_ext.shape
    b = bits_ext.reshape(S_ext, 8, n_tiles, tl)
    pad = n_rg * rows_g - S_ext
    if pad:
        b = jnp.pad(b, ((0, pad), (0, 0), (0, 0), (0, 0)))
    b = b.reshape(n_rg, rows_g, 8, n_tiles, tl).transpose(0, 3, 1, 2, 4)
    return jnp.pad(b, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))


@functools.lru_cache(maxsize=None)
def make_pallas_count_resident(
    K: int, W: int, S_ext: int, reads_per_step: int = 2,
    interpret: bool = False, num_hashes: int = 1,
):
    """VMEM-resident variant of make_pallas_count for small-S wide-T DBs
    (fine-chunked indexes: ~4k Bloom rows x 131k targets at the
    large-T bench geometry).  The BIT MATRIX moves into VMEM once per
    (row-group, lane-tile) slab and each read's K row slices become
    plain VPU vector loads with NO per-row DMA at all; measured ~27%
    over the ring kernel's random-row DMA gather (146.6k vs 115.8k
    reads/s raw at 131k targets — the ring's 246 GB/s gather is
    already strong, docs/PERF.md round-3 table).

    Returns fn(bits5d [n_rg, n_tiles, rows_g+1, 8, tl] from
    pack_resident, loc int32 [B, K] global row ids) -> counts int32
    [B, 32*W] in the same bit-major layout as make_pallas_count
    (perm_t_of_p applies unchanged).  B must be a multiple of
    reads_per_step."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    geo = resident_geometry(S_ext, W)
    assert geo is not None, (S_ext, W)
    n_rg, rows_g, n_tiles, tl = geo
    # multi-hash row-ANDs cannot decompose across row groups (an
    # out-of-group row reads as zero and would poison the AND)
    assert num_hashes == 1 or n_rg == 1, (num_hashes, n_rg)
    H = num_hashes
    R = reads_per_step

    def kernel(loc_ref, bits_ref, out_ref, slab, sem):
        rg = pl.program_id(0)
        ti = pl.program_id(1)
        bi = pl.program_id(2)
        b0 = bi * R
        lo = rg * rows_g

        @pl.when(bi == 0)
        def _():
            # new (row-group, tile): pull its slab into VMEM once; the
            # ~15 MB DMA amortizes over the whole read sweep
            cp = pltpu.make_async_copy(bits_ref.at[rg, ti], slab, sem)
            cp.start()
            cp.wait()

        for r in range(R):
            def fetch(i):
                def one(hj):
                    li = loc_ref[b0 + r, i * H + hj]
                    inb = (li >= lo) & (li < lo + rows_g)
                    return slab[jnp.where(inb, li - lo, rows_g)]
                x = one(0)
                for hj in range(1, H):
                    x = x & one(hj)  # fused pand row-AND
                return x

            planes = _fold_planes(fetch, K)
            for j in range(32):
                acc = _unpack_j(planes, j, jnp)
                # n_rg == 1 writes the final counts; multi-group writes
                # its own [rg] output slice (summed by XLA afterwards:
                # revisited out blocks are only sound on consecutive
                # steps, and rg must stay outermost for slab reuse)
                if n_rg == 1:
                    out_ref[r, j, 0] = acc.astype(jnp.int32)
                else:
                    out_ref[0, r, j, 0] = acc.astype(jnp.int32)

    @jax.jit
    def _run(bits5d, loc):
        B = loc.shape[0]
        assert B % R == 0, (B, R)
        # the tile dim sits at -3 (blocks may only tile the LAST TWO
        # dims; (8, tl) are the hardware tile there)
        if n_rg == 1:
            out_shape = jax.ShapeDtypeStruct(
                (B, 32, n_tiles, 8, tl), jnp.int32
            )
            out_spec = pl.BlockSpec(
                (R, 32, 1, 8, tl), lambda rg, t, b: (b, 0, t, 0, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            out_shape = jax.ShapeDtypeStruct(
                (n_rg, B, 32, n_tiles, 8, tl), jnp.int32
            )
            out_spec = pl.BlockSpec(
                (1, R, 32, 1, 8, tl),
                lambda rg, t, b: (rg, b, 0, t, 0, 0),
                memory_space=pltpu.VMEM,
            )
        fn = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(n_rg, n_tiles, B // R),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((rows_g + 1, 8, tl), jnp.uint32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )
        out = fn(loc.reshape(B, -1), bits5d)
        if n_rg > 1:
            out = out.sum(axis=0, dtype=jnp.int32)
        # [B, 32, n_tiles, 8, tl] -> bit-major [B, 32*W]: lane w is word
        # s*W8 + t*tl + l, so swap (t, s) before flattening — matching
        # make_pallas_count's layout (perm_t_of_p applies unchanged)
        return out.transpose(0, 1, 3, 2, 4).reshape(B, 32 * W)

    def run(bits5d, loc):
        return _run(bits5d, loc)

    run.reads_per_step = R
    run.geometry = (n_rg, rows_g, n_tiles, tl)
    return run


@functools.lru_cache(maxsize=None)
def make_pallas_count_masked(
    K: int, W: int, S_ext: int, reads_per_step: int = 2,
    interpret: bool = False, num_hashes: int = 1,
):
    """VMEM-resident count kernel WITH fused thresholding: alongside
    the counts it emits a packed candidate bitmask (bit j of word
    mask[b, w] = candidate at bit-major lane p = j*W + w), so the tail
    scans B*W words instead of B*32*W count lanes — a 32x cut of the
    threshold pass that dominated the unfused tail (measured: the XLA
    threshold/compaction over the 537 MB counts array cost ~35 us/read
    vs ~7 us in-kernel at 131k targets).

    The per-candidate predicate folds every filter into two tables the
    caller precomputes (mirroring the host path's INT32_MAX trick,
    device.py::HostDB.read_thresholds):
      thr  [32, n_tiles, 8, tl] i32 — per-LANE floor in the kernel's
           bit-major layout: max(tmin, 1) where sizes_pos else huge;
      cthr [B, 1] i32 — per-READ floor: cmin[nkmers], or huge when the
           read is excluded (too short / over the dedup threshold).
    Candidate iff count >= max(thr_lane, cthr_read) — identical to the
    XLA tail's conjunction.

    Single row group only (thresholds need total counts; multi-group
    DBs keep the unfused resident kernel + XLA tail).

    Returns fn(bits5d, loc, cthr, thr) -> (counts int32 [B, 32*W]
    bit-major, mask uint32 [B, W])."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    geo = resident_geometry(S_ext, W)
    assert geo is not None and geo[0] == 1, (S_ext, W, geo)
    _, rows_g, n_tiles, tl = geo
    H = num_hashes
    R = reads_per_step

    def kernel(loc_ref, thr_ref, bits_ref, out_ref, mask_ref,
               slab, sem):
        # loc_ref: SMEM (B, K*h + 1) int32 — trailing column = cthr
        # (SMEM windows pad the minor dim to 128-lane multiples, so the
        # per-read floor folds into the location table rather than
        # costing its own padded array)
        ti = pl.program_id(1)
        bi = pl.program_id(2)
        b0 = bi * R

        @pl.when(bi == 0)
        def _():
            cp = pltpu.make_async_copy(bits_ref.at[0, ti], slab, sem)
            cp.start()
            cp.wait()

        for r in range(R):
            def fetch(i):
                def one(hj):
                    li = loc_ref[b0 + r, i * H + hj]
                    inb = (li >= 0) & (li < rows_g)
                    return slab[jnp.where(inb, li, rows_g)]
                x = one(0)
                for hj in range(1, H):
                    x = x & one(hj)  # fused pand row-AND
                return x

            planes = _fold_planes(fetch, K)
            cthr = loc_ref[b0 + r, K * H]
            mbits = None
            for j in range(32):
                cnt = _unpack_j(planes, j, jnp).astype(jnp.int32)
                out_ref[r, j, 0] = cnt
                thrj = jnp.maximum(thr_ref[j, ti], cthr)
                okj = (cnt >= thrj).astype(jnp.uint32) << jnp.uint32(j)
                mbits = okj if mbits is None else mbits | okj
            mask_ref[r, 0] = mbits

    @jax.jit
    def _run(bits5d, loc, cthr, thr):
        B = loc.shape[0]
        assert B % R == 0, (B, R)
        fn = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((B, 32, n_tiles, 8, tl), jnp.int32),
                jax.ShapeDtypeStruct((B, n_tiles, 8, tl), jnp.uint32),
            ),
            grid=(1, n_tiles, B // R),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(
                    (R, 32, 1, 8, tl), lambda rg, t, b: (b, 0, t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (R, 1, 8, tl), lambda rg, t, b: (b, t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((rows_g + 1, 8, tl), jnp.uint32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )
        loc_ext = jnp.concatenate(
            [loc.reshape(B, -1), cthr.astype(jnp.int32)], axis=1
        )
        counts, mask = fn(loc_ext, thr, bits5d)
        return (
            counts.transpose(0, 1, 3, 2, 4).reshape(B, 32 * W),
            mask.transpose(0, 2, 1, 3).reshape(B, W),
        )

    def run(bits5d, loc, cthr, thr):
        return _run(bits5d, loc, cthr, thr)

    run.reads_per_step = R
    run.geometry = (1, rows_g, n_tiles, tl)
    return run


def thr_table_masked(tmin_perm, sizes_pos_perm, W: int):
    """Per-lane threshold floor for make_pallas_count_masked, in its
    [32, n_tiles, 8, tl] layout: tmin on real target lanes (count >=
    max(tmin, cthr) is EXACTLY the XLA tail's conjunction), ~2^30 on
    padding lanes (cthr stays below it, and the max with cthr must not
    overflow int32)."""
    import jax.numpy as jnp

    geo_tl = 128
    n_tiles = W // 8 // geo_tl
    eff = jnp.where(
        sizes_pos_perm, tmin_perm.astype(jnp.int32), jnp.int32(2**30)
    )
    return (
        eff.reshape(32, 8, n_tiles, geo_tl).transpose(0, 2, 1, 3)
    )


def thr_table_ring(tmin_perm, sizes_pos_perm, W: int):
    """Per-lane threshold floor for the masked RING kernel, in its
    [32, 8, W//8] count layout (bit-major lane w = s*(W//8) + l)."""
    import jax.numpy as jnp

    eff = jnp.where(
        sizes_pos_perm, tmin_perm.astype(jnp.int32), jnp.int32(2**30)
    )
    return eff.reshape(32, 8, W // 8)


def pack_pair_blocks(bits_ext, n_blocks: int, s_block: int):
    """Row-stacked screened DB [nb*S_b + 1, W_b] -> per-block VMEM slabs
    [nb, S8, 8, 128] for make_pallas_pair_count, each slab carrying its
    own zero sentinel row at local index s_block (W_b must be 128 words
    = 4096 targets/block, the tpu-native default).  Runs on device."""
    import jax.numpy as jnp

    W_b = bits_ext.shape[1]
    assert W_b == 128, W_b
    S8 = -(-(s_block + 1) // 8)
    b = bits_ext[: n_blocks * s_block].reshape(n_blocks, s_block, W_b)
    b = jnp.pad(b, ((0, 0), (0, S8 * 8 - s_block), (0, 0)))
    return b.reshape(n_blocks, S8, 8, W_b)


@functools.lru_cache(maxsize=None)
def make_pallas_pair_count(
    K: int, s_block: int, n_blocks: int, pairs_per_step: int = 8,
    interpret: bool = False,
):
    """Block-stationary pass-2 of the two-pass screened search: counts
    the active (read, block) pairs with the block's bit slab RESIDENT
    in VMEM instead of the XLA row gather (measured element-issue-bound
    at ~1.7 G elem/s on the 512-byte block rows — 74% of the screened
    step at 524k targets).

    Pairs arrive SORTED BY BLOCK (padding pairs, block id = n_blocks,
    sort last): the kernel walks pair tiles sequentially, re-DMAs the
    ~S_b/2-KB slab only when the block id changes (<= n_blocks + 1
    reloads per batch), folds each pair's K row slices through the
    Harley-Seal counter with a sublane mask (rows pack 8-per-(8,128)
    tile; the masked fold leaves each window's row at its own sublane
    and a roll-reduce after the unpack sums them), and fuses the
    thresholds: per-block per-target floors ride in a [nb, 32, 128]
    VMEM table, the per-read floor as the tab's trailing column.
    All-padding tiles skip the fold entirely.

    fn(bits6 [nb, S8, 8, 128] u32 (pack_pair_blocks),
       tab int32 [P, K + 2] (cols: K row ids in the block modulus with
         sentinel s_block; block id; cthr),
       thr int32 [nb, 32, 128] (floor of target g*4096 + l*32 + j at
         [g, j, l]; ~2^30 on padding lanes))
      -> (counts int32 [P, 32, 128] (count of target l*32+j at
          [p, j, l]), mask uint32 [P, 128] (bit j of word l = candidate
          l*32+j)).  P must be a multiple of pairs_per_step."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P_t = pairs_per_step
    S8 = -(-(s_block + 1) // 8)
    NB = n_blocks

    def kernel(tab_ref, thr_ref, bits_ref, counts_ref, mask_ref,
               slab, sem, cur):
        ti = pl.program_id(0)

        @pl.when(ti == 0)
        def _():
            cur[0] = jnp.int32(-1)

        is_pad = tab_ref[0, K] == jnp.int32(NB)  # sorted: whole tile

        @pl.when(jnp.logical_not(is_pad))
        def _():
            sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            for p in range(P_t):
                blk = jnp.clip(tab_ref[p, K], 0, NB - 1)

                @pl.when(blk != cur[0])
                def _(blk=blk):
                    cp = pltpu.make_async_copy(
                        bits_ref.at[blk], slab, sem
                    )
                    cp.start()
                    cp.wait()
                    cur[0] = blk

                def fetch(i, p=p):
                    li = tab_ref[p, i]
                    x8 = slab[li // 8]  # (8, 128) row group
                    return jnp.where(
                        sub_iota == li % 8, x8, jnp.uint32(0)
                    )

                planes = _fold_planes(fetch, K)
                cthr = tab_ref[p, K + 1]
                thr_b = thr_ref[blk]  # (32, 128) int32
                mbits = None
                for j in range(32):
                    c8 = _unpack_j(planes, j, jnp)  # (8,128) partials
                    for sh in (4, 2, 1):  # roll-reduce over sublanes
                        c8 = c8 + pltpu.roll(c8, sh, 0)
                    cnt = c8[:1].astype(jnp.int32)  # (1, 128) total
                    counts_ref[p, j : j + 1, :] = cnt
                    thrj = jnp.maximum(thr_b[j : j + 1, :], cthr)
                    okj = (cnt >= thrj).astype(jnp.uint32) << jnp.uint32(j)
                    mbits = okj if mbits is None else mbits | okj
                mask_ref[p : p + 1, :] = mbits

        @pl.when(is_pad)
        def _():
            counts_ref[...] = jnp.zeros(
                (P_t, 32, 128), jnp.int32
            )
            mask_ref[...] = jnp.zeros((P_t, 128), jnp.uint32)

    @jax.jit
    def _run(bits6, tab, thr):
        P = tab.shape[0]
        assert P % P_t == 0, (P, P_t)
        counts, mask = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((P, 32, 128), jnp.int32),
                jax.ShapeDtypeStruct((P, 128), jnp.uint32),
            ),
            grid=(P // P_t,),
            in_specs=[
                pl.BlockSpec((P_t, K + 2), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((P_t, 32, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P_t, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((S8, 8, 128), jnp.uint32),
                pltpu.SemaphoreType.DMA,
                pltpu.SMEM((1,), jnp.int32),
            ],
            interpret=interpret,
        )(tab, thr, bits6)
        return counts, mask

    def run(bits6, tab, thr):
        return _run(bits6, tab, thr)

    run.pairs_per_step = P_t
    return run


def thr_table_pairs(tmin, sizes_pos, n_blocks: int):
    """[nb*4096] per-target floors -> the pair kernel's [nb, 32, 128]
    layout (target g*4096 + l*32 + j at [g, j, l]); ~2^30 on padding
    lanes (the max with cthr must not overflow int32)."""
    import jax.numpy as jnp

    eff = jnp.where(
        sizes_pos, tmin.astype(jnp.int32), jnp.int32(2**30)
    )
    return eff.reshape(n_blocks, 128, 32).transpose(0, 2, 1)


def pack_gemm_blocks(bits_ext, n_blocks: int, s_block: int, S_pad: int):
    """Row-stacked screened DB [nb*s_block + 1, 128] uint32 -> unpacked
    per-block byte matrices [nb, S_pad, 4096] uint8 (bit value 0/1) for
    the grouped-GEMM pass 2 (make_pallas_group_count): target
    g*4096 + w*32 + j lives at [g, :, w*32 + j].  Rows s_block..S_pad-1
    are zero (the location sentinel and the sublane/lane padding), so
    sentinel k-mers contribute nothing to the matmul.  Runs on device
    (one-time per DB); the u8 matrix is 8x the packed bits — HBM rent
    paid for moving the count contraction onto the MXU."""
    import jax.numpy as jnp

    W_b = bits_ext.shape[1]
    assert W_b == 128, W_b
    b = bits_ext[: n_blocks * s_block].reshape(n_blocks, s_block, W_b)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    u8 = (
        (b[..., None] >> shifts) & jnp.uint32(1)
    ).astype(jnp.int8).reshape(n_blocks, s_block, W_b * 32)
    return jnp.pad(u8, ((0, 0), (0, S_pad - s_block), (0, 0)))


@functools.lru_cache(maxsize=None)
def make_pallas_group_count(
    S_pad: int, n_blocks: int, t_block: int = 4096, T_t: int = 512,
    P_t: int = 128, interpret: bool = False,
):
    """Grouped-GEMM pass 2 of the two-pass screened search: the count
    contraction counts[p, t] = sum_s U[p, s] * bits[blk(p), s, t] runs
    on the MXU as per-tile [P_t, S_pad] @ [S_pad, T_t] matmuls instead
    of the VPU bit-fold — the round-5 answer to the pair kernel's 1/8
    sublane occupancy (ROADMAP item 1): U rows carry each pair's k-mer
    row MULTIPLICITIES (the reference's pospop counts each k-mer's row
    independently, util-db-search.go:6728, so multiplicity-weighted row
    sums are the identical contraction), bf16 holds multiplicities
    <= 256 exactly, and f32 accumulation is exact below 2^24.

    Pairs arrive block-sorted AND per-block padded to P_t multiples, so
    every pair tile touches ONE block: tile block ids ride in SMEM; the
    grid runs t-major-outer so consecutive pair tiles reuse the block
    slab (re-DMA only on block change, <= nb + 1 per t sweep).

    fn(bits8 [nb, S_pad, t_block] u8 (pack_gemm_blocks),
       u_p bf16 [P_pad, S_pad] (zero rows on padding slots),
       blk int32 [P_pad // P_t] (tile block id; n_blocks = all-padding))
      -> counts int32 [P_pad, t_block] (natural target-major layout)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NB = n_blocks
    assert t_block % T_t == 0

    def kernel(blk_ref, u_ref, bits_ref, out_ref, slab, slab_bf, sem, cur):
        ti = pl.program_id(0)
        pi = pl.program_id(1)
        g = blk_ref[pi]

        @pl.when(pi == 0)
        def _():
            cur[0] = jnp.int32(-1)

        @pl.when(g < NB)
        def _():
            @pl.when(g != cur[0])
            def _():
                cp = pltpu.make_async_copy(
                    bits_ref.at[jnp.clip(g, 0, NB - 1), :,
                                pl.ds(ti * T_t, T_t)],
                    slab, sem,
                )
                cp.start()
                cp.wait()
                slab_bf[...] = slab[...].astype(jnp.bfloat16)
                cur[0] = g

            out_ref[...] = jnp.dot(
                u_ref[...], slab_bf[...],
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)

        @pl.when(g >= NB)
        def _():
            out_ref[...] = jnp.zeros((P_t, T_t), jnp.int32)

    @jax.jit
    def _run(bits8, u_p, blk):
        P_pad = u_p.shape[0]
        assert P_pad % P_t == 0, (P_pad, P_t)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((P_pad, t_block), jnp.int32),
            grid=(t_block // T_t, P_pad // P_t),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (P_t, S_pad), lambda t, p: (p, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (P_t, T_t), lambda t, p: (p, t),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((S_pad, T_t), jnp.int8),
                pltpu.VMEM((S_pad, T_t), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
                pltpu.SMEM((1,), jnp.int32),
            ],
            interpret=interpret,
        )(blk, u_p, bits8)

    def run(bits8, u_p, blk):
        return _run(bits8, u_p, blk)

    run.pairs_per_step = P_t
    return run
