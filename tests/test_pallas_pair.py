"""The block-stationary Mosaic pair kernel (screened pass-2) vs the XLA
pass-2 — hermetic interpret-mode parity at the _make_screened_tail level.

The two tails receive identical synthetic inputs (random stacked block
bits, union table, location planes) and must produce byte-identical
(meta, aux) results: same candidate order (ascending read, block,
target — the reference emits matches query-major then target-ascending,
util-db-search.go:1174-1201), same counts, same overflow poison.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from kmcp_tpu.search.device import _make_screened_tail  # noqa: E402
from kmcp_tpu.search.pallas_count import pack_pair_blocks  # noqa: E402

NB, S_BLOCK, T_BLOCK = 3, 40, 4096
B, K, NU = 32, 12, 57


def _synthetic(seed, density_ands=3):
    rng = np.random.default_rng(seed)
    bits = rng.integers(
        0, 2**32, (NB * S_BLOCK + 1, T_BLOCK // 32), dtype=np.uint64
    ).astype(np.uint32)
    for _ in range(density_ands):
        bits &= rng.integers(
            0, 2**32, bits.shape, dtype=np.uint64
        ).astype(np.uint32)
    bits[-1] = 0
    u = rng.integers(0, 2**32, (NU + 1, 1), dtype=np.uint64).astype(
        np.uint32
    )
    u[-1] = 0
    args = (
        u,
        rng.integers(0, S_BLOCK + 1, (K, B)).astype(np.int32),  # loc_t
        rng.integers(0, NU + 1, (K, B)).astype(np.int32),  # locu_t
        rng.integers(1, K + 1, (1, B)).astype(np.int32),  # nk
        np.r_[np.int32(3), rng.integers(20, 60, B - 1).astype(np.int32)],
        np.maximum(1, (np.arange(K + 1) * 0.3).astype(np.int32)),  # cmin
        rng.integers(0, 3, (NB, K + 1)).astype(np.int32),  # theta
        rng.integers(3, 6, (NB * T_BLOCK,)).astype(np.int32),  # tmin
        rng.random(NB * T_BLOCK) > 0.2,  # sizes_pos
    )
    return bits, tuple(jnp.asarray(a) for a in args)


def _run_both(bits, args, cand_budget, pair_budget):
    xla = _make_screened_tail(
        cand_budget, pair_budget, 10, 1000, NB, T_BLOCK, S_BLOCK, 1
    )
    m0, a0 = xla(jnp.asarray(bits), *args)
    pal = _make_screened_tail(
        cand_budget, pair_budget, 10, 1000, NB, T_BLOCK, S_BLOCK, 1,
        pair_pc=(K, True),  # interpret mode: hermetic on the CPU mesh
    )
    m1, a1 = pal(pack_pair_blocks(jnp.asarray(bits), NB, S_BLOCK), *args)
    return (np.asarray(m0), np.asarray(a0)), (np.asarray(m1), np.asarray(a1))


def test_pair_kernel_tail_parity():
    bits, args = _synthetic(3)
    (m0, a0), (m1, a1) = _run_both(bits, args, 65536, 96)
    n = int(m0[0])
    assert n == int(m1[0]) and 0 < n <= 65536
    assert (m0[1 : 1 + n] == m1[1 : 1 + n]).all()  # read ids
    assert (
        m0[1 + 65536 : 1 + 65536 + n] == m1[1 + 65536 : 1 + 65536 + n]
    ).all()  # target ids
    assert (a0[:n] == a1[:n]).all()  # counts
    assert (a0[65536:] == a1[65536:]).all()  # nkmers


def test_pair_kernel_overflow_agreement():
    # a starved candidate budget must poison n_cand identically on both
    # tails so the caller's 4x retry fires either way
    bits, args = _synthetic(3)
    (m0, _), (m1, _) = _run_both(bits, args, 256, 96)
    assert int(m0[0]) == int(m1[0]) == 257


def _run_gemm(bits, args, cand_budget, pair_budget):
    """XLA pass-2 vs the grouped-GEMM Mosaic pass-2 (round 5), both in
    hermetic interpret mode on the CPU mesh."""
    from kmcp_tpu.search.device import _gemm_geometry
    from kmcp_tpu.search.pallas_count import pack_gemm_blocks

    xla = _make_screened_tail(
        cand_budget, pair_budget, 10, 1000, NB, T_BLOCK, S_BLOCK, 1
    )
    m0, a0 = xla(jnp.asarray(bits), *args)
    S_pad, T_t = _gemm_geometry(S_BLOCK, T_BLOCK)
    gem = _make_screened_tail(
        cand_budget, pair_budget, 10, 1000, NB, T_BLOCK, S_BLOCK, 1,
        gemm_pc=(S_pad, T_t, True),  # interpret mode
    )
    m1, a1 = gem(
        pack_gemm_blocks(jnp.asarray(bits), NB, S_BLOCK, S_pad), *args
    )
    return (np.asarray(m0), np.asarray(a0)), (np.asarray(m1), np.asarray(a1))


def test_gemm_tail_parity():
    """The MXU grouped-GEMM pass-2 must be byte-identical to the XLA
    pass-2: same candidate order, counts, nkmers."""
    bits, args = _synthetic(3)
    (m0, a0), (m1, a1) = _run_gemm(bits, args, 65536, 96)
    n = int(m0[0])
    assert n == int(m1[0]) and 0 < n <= 65536
    assert (m0[1 : 1 + n] == m1[1 : 1 + n]).all()
    assert (
        m0[1 + 65536 : 1 + 65536 + n] == m1[1 + 65536 : 1 + 65536 + n]
    ).all()
    assert (a0[:n] == a1[:n]).all()
    assert (a0[65536:] == a1[65536:]).all()


def test_gemm_tail_overflow_agreement():
    bits, args = _synthetic(3)
    (m0, _), (m1, _) = _run_gemm(bits, args, 256, 96)
    assert int(m0[0]) == int(m1[0]) == 257


def test_gemm_tail_matches_pair_kernel():
    """Three-way: GEMM pass-2 == pair-kernel pass-2 on a second seed."""
    bits, args = _synthetic(11)
    (_, _), (mp, ap) = _run_both(bits, args, 65536, 96)
    (_, _), (mg, ag) = _run_gemm(bits, args, 65536, 96)
    np.testing.assert_array_equal(mp, mg)
    np.testing.assert_array_equal(ap, ag)


def test_build_u_digit_exact():
    """Digit-GEMM multiplicity build == numpy bincount, incl. sentinel
    rows and multiplicities > 1."""
    from kmcp_tpu.search.device import _build_u_digit

    rng = np.random.default_rng(5)
    B2, K2, S_pad = 64, 200, 384
    loc = rng.integers(0, 301, size=(B2, K2)).astype(np.int32)
    loc[0, :] = 7  # multiplicity 200 on one row (homopolymer shape)
    u = np.asarray(_build_u_digit(jnp.asarray(loc), S_pad)).astype(np.int32)
    ref = np.zeros((B2, S_pad), np.int32)
    np.add.at(ref, (np.arange(B2)[:, None], loc), 1)
    np.testing.assert_array_equal(u, ref)
