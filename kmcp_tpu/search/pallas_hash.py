"""Pallas TPU kernel: batched rolling ntHash1 -> Bloom row locations.

Hardware-shaped alternative to the XLA associative-scan formulation
(device.py::_make_read_search_step): the roll is sequential along the
base axis — a cheap dependency chain — while the VPU parallelizes across
a 256-read lane tile.  uint64 state is carried as explicit uint32
(hi, lo) pairs (no x64 emulation), seeds are selected arithmetically
(4 compares, no gathers), and ``hash mod num_sigs`` uses an exact
fold-and-double reduction in uint32.

Bit-identical to kmcp_tpu/kmer/nthash.py / native/nthash.cpp:

    fh' = rol(fh,1) ^ [rol(seed(out), k) if window full] ^ seed(in)
    rh' = ror(rh,1) ^ [ror(seedc(out),1)]              ^ rol(seedc(in), k-1)
    h   = min(fh, rh); invalid windows (non-ACGT, h==0, h>max_hash)
          emit the sentinel row ``num_sigs``.

Arrays are processed transposed ([L, B] / [K, B]) so each rolling step
reads and writes full 256-lane rows.
"""

from __future__ import annotations

import functools

import numpy as np

TILE_B = 256


def _split64(v: int) -> tuple[int, int]:
    return (v >> 32) & 0xFFFFFFFF, v & 0xFFFFFFFF


@functools.lru_cache(maxsize=None)
def make_pallas_hash_loc(
    k: int,
    lmax: int,
    num_sigs: int,
    max_hash: int,
    interpret: bool = False,
    num_hashes: int = 1,
    screen_sigs: int = 0,
    emit_values: bool = False,
    packed4: bool = False,
    packed2: bool = False,
):
    """Build fn(reads_u8[B, lmax]) -> (loc_t int32 [kmax, B] per hash
    function, ..., nk int32 [1, B]).  B must be a multiple of 256.
    The [B, L] -> [L, B] transpose the kernel wants runs on device
    (fused with the uint8 -> int32 widen) — shipping the natural row
    layout saves a 21 MB host-side transpose copy per 131k-read batch.

    For num_hashes > 1 the Bloom locations follow the reference's
    ``uint32(hi + lo*j) mod S`` derivation (util-hash.go:61-142) — pure
    uint32 arithmetic, no pair modulo needed.

    With ``screen_sigs`` > 0 one extra plane ``h mod screen_sigs`` is
    appended after the hash planes (sentinel = screen_sigs): the
    block-union screen locations of the two-pass wide-T search
    (device.py::_make_screened_tail).

    With ``emit_values`` two uint32 planes (h_hi, h_lo) of the raw
    64-bit window value follow the nk output (invalid windows emit 0 —
    h==0 is itself defined invalid), feeding the device-side >threshold
    k-mer dedup of paired streaming (device.py::_dedup_value_planes).

    With ``packed4`` the input is [B, lmax//2] uint8 holding two 4-bit
    base codes per byte (native.pack_rows_4bit: A=1 C=2 G=3 T=4,
    anything else 0=invalid; low nibble first) — half the H2D bytes;
    decoded to the ASCII plane on device before the kernel.

    With ``packed2`` the input is a TUPLE (codes [B, lmax//4] uint8 —
    four 2-bit base codes per byte, low pair first — and nmask
    [B, lmax//8] uint8, bit i%8 of byte i//8 set = invalid base):
    0.375x the ASCII bytes (native.pack_rows_2bit), for the
    tunnel-H2D-bound demo-scale path."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..kmer.nthash import SEED_A, SEED_C, SEED_G, SEED_T

    kmax = lmax - k + 1
    S32 = np.uint32(num_sigs)
    mh_hi, mh_lo = (np.uint32(x) for x in _split64(max_hash))
    n_planes = num_hashes + (1 if screen_sigs else 0)

    SA = _split64(int(SEED_A))
    SC = _split64(int(SEED_C))
    SG = _split64(int(SEED_G))
    ST = _split64(int(SEED_T))

    def rol_pair(hi, lo, r: int):
        r %= 64
        if r == 0:
            return hi, lo
        if r == 32:
            return lo, hi
        if r < 32:
            rr, inv = np.uint32(r), np.uint32(32 - r)
            return ((hi << rr) | (lo >> inv)), ((lo << rr) | (hi >> inv))
        return rol_pair(lo, hi, r - 32)

    def ror_pair(hi, lo, r: int):
        return rol_pair(hi, lo, (64 - r) % 64)

    def seeds_of(bases):
        """bases: [B] int32 ASCII.  Returns (s_hi, s_lo, sc_hi, sc_lo, ok);
        comp(A)=T etc., via 4 arithmetic selects on the uppercased byte."""
        up = bases & jnp.int32(0xDF)  # uppercase ASCII letters
        is_a = up == jnp.int32(ord("A"))
        is_c = up == jnp.int32(ord("C"))
        is_g = up == jnp.int32(ord("G"))
        is_t = up == jnp.int32(ord("T"))
        ok = is_a | is_c | is_g | is_t

        def pick(a, c, g, t):
            z = jnp.zeros_like(up, dtype=jnp.uint32)
            v = jnp.where(is_a, jnp.uint32(a), z)
            v = jnp.where(is_c, jnp.uint32(c), v)
            v = jnp.where(is_g, jnp.uint32(g), v)
            v = jnp.where(is_t, jnp.uint32(t), v)
            return v

        s_hi = pick(SA[0], SC[0], SG[0], ST[0])
        s_lo = pick(SA[1], SC[1], SG[1], ST[1])
        # complement seeds: A<->T, C<->G
        sc_hi = pick(ST[0], SG[0], SC[0], SA[0])
        sc_lo = pick(ST[1], SG[1], SC[1], SA[1])
        return s_hi, s_lo, sc_hi, sc_lo, ok

    def make_mod_pair(sigs: int):
        """(hi*2^32 + lo) mod sigs, exactly, in uint32 arithmetic.

        Three lowerings by modulus shape (the general fold-and-double
        chain costs ~150 VPU ops per position and dominated the hash
        kernel in the screened wide-T regime):
        - power of two: 2^32 mod sigs == 0, so the answer is one AND
          on the low word (union screens are sized to powers of two at
          index build since round 4 for exactly this);
        - sigs <= 65536: (hi mod M)*(2^32 mod M) + (lo mod M) stays
          below 2^32 ((M-1)^2 + (M-1) < 2^32 at M = 65536), so one
          16x16 multiply + three constant mods (XLA lowers % by a
          constant to multiply-shift) replace the fold — the screened
          path's per-block Bloom moduli (s_block ~ 3.6k rows) take
          this;
        - otherwise: the exact fold-and-double reduction."""
        if sigs & (sigs - 1) == 0:
            MASK = np.uint32(sigs - 1)

            def mod_pow2(hi, lo):
                return lo & MASK

            return mod_pow2
        if sigs <= 65536:
            M32s = np.uint32(sigs)
            P32s = np.uint32((1 << 32) % sigs)

            def mod_small(hi, lo):
                return ((hi % M32s) * P32s + (lo % M32s)) % M32s

            return mod_small
        M32 = np.uint32(sigs)
        pow32 = (1 << 32) % sigs

        def dbl16(v):
            for _ in range(16):
                v = v << jnp.uint32(1)
                v = jnp.where(v >= M32, v - M32, v)
            return v

        def mod_pair(hi, lo):
            r_hi = hi % M32
            # fold: (r_hi * pow32) mod sigs via 16-bit splits
            a1, a0 = r_hi >> jnp.uint32(16), r_hi & jnp.uint32(0xFFFF)
            b1 = jnp.uint32(pow32 >> 16)
            b0 = jnp.uint32(pow32 & 0xFFFF)
            p11 = (a1 * b1) % M32
            p10 = (a1 * b0) % M32
            p01 = (a0 * b1) % M32
            p00 = (a0 * b0) % M32
            t = dbl16(dbl16(p11))
            mid = p10 + p01
            mid = jnp.where(mid >= M32, mid - M32, mid)
            t = t + dbl16(mid)
            t = jnp.where(t >= M32, t - M32, t)
            t = t + p00
            t = jnp.where(t >= M32, t - M32, t)
            t = t + (lo % M32)
            t = jnp.where(t >= M32, t - M32, t)
            return t

        return mod_pair

    mod_pair = make_mod_pair(num_sigs)
    mod_screen = make_mod_pair(screen_sigs) if screen_sigs else None

    # dynamic sublane reads must be 8-aligned on TPU: process positions in
    # blocks of 8, and fetch the out-base rows from a 16-row aligned block
    # at a constant intra-block offset (k is static).
    OFF = (-k) % 8  # (base - k) mod 8, constant

    def make_kernel(TB):
      def kernel(reads_ref, *out_refs):
        loc_refs = out_refs[:n_planes]
        nk_ref = out_refs[n_planes]
        val_refs = out_refs[n_planes + 1 :]  # (hi, lo) if emit_values
        B = TB
        zero = jnp.zeros((B,), jnp.uint32)

        def blk(bidx, carry):
            fh_hi, fh_lo, rh_hi, rh_lo, run, nk = carry
            base = pl.multiple_of(bidx * 8, 8)
            rows_in = reads_ref[pl.ds(base, 8), :]  # [8, B] int32
            a_raw = bidx * 8 - (k + OFF)
            # exactly one boundary block has a_raw == -8; its out rows sit
            # one 8-row slot later inside the clamped window
            neg = a_raw < 0
            a = pl.multiple_of(jnp.maximum(a_raw, 0), 8)
            rows_out = reads_ref[pl.ds(a, 8 + 8), :]  # [16, B]

            locs = [[] for _ in range(n_planes)]
            vals = ([], [])
            for j in range(8):
                i = bidx * 8 + j
                b_in = rows_in[j, :]
                s_hi, s_lo, sc_hi, sc_lo, ok_in = seeds_of(b_in)
                run = jnp.where(ok_in, run + 1, 0)
                b_out = jnp.where(
                    neg,
                    rows_out[max(OFF + j - 8, 0), :],
                    rows_out[OFF + j, :],
                )
                so_hi, so_lo, sco_hi, sco_lo, _ = seeds_of(b_out)
                # subtract the out-base only when the previous window was
                # complete (continuous run beyond k bases)
                use_out = (i >= k) & (run > k)

                nfh = rol_pair(fh_hi, fh_lo, 1)
                ot = rol_pair(so_hi, so_lo, k % 64)
                fh_hi = nfh[0] ^ jnp.where(use_out, ot[0], zero) ^ s_hi
                fh_lo = nfh[1] ^ jnp.where(use_out, ot[1], zero) ^ s_lo

                nrh = ror_pair(rh_hi, rh_lo, 1)
                oct_ = ror_pair(sco_hi, sco_lo, 1)
                ict = rol_pair(sc_hi, sc_lo, (k - 1) % 64)
                rh_hi = nrh[0] ^ jnp.where(use_out, oct_[0], zero) ^ ict[0]
                rh_lo = nrh[1] ^ jnp.where(use_out, oct_[1], zero) ^ ict[1]

                # reset the rolling state after an invalid base
                fh_hi = jnp.where(ok_in, fh_hi, zero)
                fh_lo = jnp.where(ok_in, fh_lo, zero)
                rh_hi = jnp.where(ok_in, rh_hi, zero)
                rh_lo = jnp.where(ok_in, rh_lo, zero)

                use_r = (rh_hi < fh_hi) | (
                    (rh_hi == fh_hi) & (rh_lo < fh_lo)
                )
                h_hi = jnp.where(use_r, rh_hi, fh_hi)
                h_lo = jnp.where(use_r, rh_lo, fh_lo)
                valid = run >= k
                valid &= ~((h_hi == zero) & (h_lo == zero))
                valid &= (h_hi < jnp.uint32(mh_hi)) | (
                    (h_hi == jnp.uint32(mh_hi))
                    & (h_lo <= jnp.uint32(mh_lo))
                )
                valid &= i >= k - 1  # a full window exists
                if num_hashes == 1:
                    loc = mod_pair(h_hi, h_lo).astype(jnp.int32)
                    locs[0].append(
                        jnp.where(valid, loc, jnp.int32(num_sigs))
                    )
                else:
                    for hj in range(num_hashes):
                        v = h_hi + h_lo * jnp.uint32(hj)  # uint32 wrap
                        loc = (v % S32).astype(jnp.int32)
                        locs[hj].append(
                            jnp.where(valid, loc, jnp.int32(num_sigs))
                        )
                if mod_screen is not None:
                    loc_u = mod_screen(h_hi, h_lo).astype(jnp.int32)
                    locs[num_hashes].append(
                        jnp.where(valid, loc_u, jnp.int32(screen_sigs))
                    )
                if emit_values:
                    vals[0].append(jnp.where(valid, h_hi, zero))
                    vals[1].append(jnp.where(valid, h_lo, zero))
                nk = nk + valid.astype(jnp.int32)

            for hj in range(n_planes):
                loc_refs[hj][pl.ds(base, 8), :] = jnp.stack(
                    locs[hj], axis=0
                )
            for vj, vref in enumerate(val_refs):
                vref[pl.ds(base, 8), :] = jnp.stack(vals[vj], axis=0)
            return (fh_hi, fh_lo, rh_hi, rh_lo, run, nk)

        init = (zero, zero, zero, zero,
                jnp.zeros((TB,), jnp.int32),
                jnp.zeros((TB,), jnp.int32))
        final = jax.lax.fori_loop(0, lmax // 8, blk, init)
        nk_ref[0, :] = final[5]

      return kernel

    # 4-bit packed input: two base CODES per byte (A=1 C=2 G=3 T=4,
    # invalid=0; native.pack_rows_4bit) — HALF the H2D bytes of the
    # ASCII layout through the tunnel, whose bandwidth is the scarce
    # resource (~150 B/read was the largest remaining per-read
    # transfer).  The nibble decode + code->ASCII LUT runs on device
    # as plain XLA ops ahead of the kernel (fused, VPU-trivial), so
    # the Mosaic kernel itself is unchanged.
    _LUT = np.zeros(16, dtype=np.int32)
    _LUT[1:5] = [ord("A"), ord("C"), ord("G"), ord("T")]
    _LUT2 = np.array(
        [ord("A"), ord("C"), ord("G"), ord("T")], dtype=np.int32
    )

    @jax.jit
    def run(reads_bl, nmask=None):
        if packed2:
            B = reads_bl.shape[0]
            codes = jnp.stack(
                [(reads_bl >> jnp.uint8(2 * j)) & jnp.uint8(3)
                 for j in range(4)],
                axis=-1,
            ).reshape(B, lmax)
            inv = jnp.stack(
                [(nmask >> jnp.uint8(j)) & jnp.uint8(1) for j in range(8)],
                axis=-1,
            ).reshape(B, lmax)
            widened = jnp.where(
                inv == 1,
                jnp.int32(0),
                jnp.take(jnp.asarray(_LUT2), codes.astype(jnp.int32)),
            ).T
        elif packed4:
            B = reads_bl.shape[0]
            codes = jnp.stack(
                [reads_bl & jnp.uint8(15), reads_bl >> jnp.uint8(4)],
                axis=-1,
            ).reshape(B, lmax)
            widened = jnp.take(jnp.asarray(_LUT), codes.T.astype(jnp.int32))
        else:
            widened = reads_bl.T.astype(jnp.int32)
        B = reads_bl.shape[0]
        # widest tile the batch divides: a (1024,) state vector maps to
        # a full native (8, 128) VPU tile, where the module-default 256
        # runs at a quarter of the lane width (measured 1.5x on the
        # 2-plane screened hash at B=4096); small test batches keep
        # 256, and the many-plane paired variants (2 loc + 2 value
        # planes at joined-row lmax) step down so the double-buffered
        # VMEM blocks stay under ~12 MB
        per_lane = (n_planes + (2 if emit_values else 0) + 2) * lmax * 4
        TB = next(
            t for t in (1024, 512, 256)
            if B % t == 0 and (t == 256 or t * per_lane * 2 <= 12 << 20)
        )
        loc_spec = pl.BlockSpec((lmax, TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        n_vals = 2 if emit_values else 0
        fn = pl.pallas_call(
            make_kernel(TB),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((lmax, B), jnp.int32)] * n_planes
            ) + (jax.ShapeDtypeStruct((1, B), jnp.int32),) + tuple(
                [jax.ShapeDtypeStruct((lmax, B), jnp.uint32)] * n_vals
            ),
            grid=(B // TB,),
            in_specs=[loc_spec],
            out_specs=tuple([loc_spec] * n_planes) + (
                pl.BlockSpec((1, TB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ) + tuple([loc_spec] * n_vals),
            interpret=interpret,
        )
        outs = fn(widened)
        locs = [o[k - 1 :, :] for o in outs[:n_planes]]
        vals = [o[k - 1 :, :] for o in outs[n_planes + 1 :]]
        return (*locs, outs[n_planes], *vals)

    def call(reads_bl):
        import jax.numpy as jnp

        if packed2:
            codes, nmask = reads_bl
            B, L = codes.shape
            assert L == lmax // 4 and B % TILE_B == 0
            return run(jnp.asarray(codes), jnp.asarray(nmask))
        B, L = reads_bl.shape
        assert L == (lmax // 2 if packed4 else lmax) and B % TILE_B == 0
        return run(jnp.asarray(reads_bl))

    return call
