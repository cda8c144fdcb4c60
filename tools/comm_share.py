"""Communication-share model for the sharded search step (VERDICT r1
item 9).

The multi-chip claim (>=80% scaling to 2 hosts, BASELINE.md north star)
needs a model before real multi-chip hardware exists.  This tool
compiles ``kmcp_tpu.search.device._make_search_step`` over a (T, B,
mesh-shape) grid on the 8-virtual-device CPU mesh, extracts every
collective op XLA actually inserted (all-gather / all-reduce /
reduce-scatter / collective-permute) with its byte size from the
compiled HLO, reads per-device compute bytes from XLA's cost analysis,
and converts both into projected TPU time via published per-chip
bandwidths:

    HBM  ~ 819 GB/s  (v5e; the gather-AND-popcount step is
                      bandwidth-bound, SURVEY section 7)
    ICI  ~ 45 GB/s   (v5e per-link bidirectional, 1D ring assumed)

comm_share = ici_time / (ici_time + hbm_time) is the fraction of a step
lost to cross-chip traffic; scaling efficiency to N chips is
1 - comm_share when compute divides evenly (targets are disjoint across
shards, SURVEY section 2.9 P3: counts concat, no reduce of the dense
matrix).

Usage: python tools/comm_share.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HBM_BPS = 819e9  # v5e HBM bandwidth
ICI_BPS = 45e9   # v5e per-link ICI (bidirectional)

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2,
                "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
                "bf16": 2, "f16": 2}

_COLL_RE = re.compile(
    r"=\s*(\w+\[[\d,x]*\][^ ]*|\([^)]*\))\s*"
    r"(all-gather|all-reduce|reduce-scatter|collective-permute)"
    r"(?:-start)?\(", )
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes of every collective in the compiled module."""
    out: dict[str, int] = {}
    for line in hlo_text.splitlines():
        m = _COLL_RE.search(line)
        if not m:
            continue
        kind = m.group(2)
        out[kind] = out.get(kind, 0) + shape_bytes(m.group(1))
    return out


def measure(T: int, B: int, d: int, t: int, cand_budget: int):
    import jax
    from jax.sharding import Mesh

    from kmcp_tpu.search.device import _make_search_step

    K, H = 131, 1
    W = T // 32
    S = max(8 * 1024, T // 4)  # Bloom rows; gather row count
    devs = np.array(jax.devices("cpu")[: d * t]).reshape(d, t)
    mesh = Mesh(devs, axis_names=("d", "t"))
    step = _make_search_step(num_hashes=H, cand_budget=cand_budget,
                             mesh=mesh)

    bits = jax.ShapeDtypeStruct((S + 1, W), np.uint32)
    loc = jax.ShapeDtypeStruct((B, K, 1, H), np.int32)
    nk = jax.ShapeDtypeStruct((B,), np.int32)
    cmin = jax.ShapeDtypeStruct((K + 1,), np.int32)
    tmin = jax.ShapeDtypeStruct((T,), np.int32)
    spos = jax.ShapeDtypeStruct((T,), bool)

    compiled = step.lower(bits, loc, nk, cmin, tmin, spos).compile()
    colls = collective_bytes(compiled.as_text())
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    comp_bytes = float(ca.get("bytes accessed", 0.0))

    coll_total = sum(colls.values())
    # per-device HBM traffic: cost_analysis is whole-program; the gather
    # and popcount reduction dominate and divide over d*t shards
    hbm_t = comp_bytes / (d * t) / HBM_BPS
    ici_t = coll_total / ICI_BPS
    share = ici_t / (ici_t + hbm_t) if (ici_t + hbm_t) else 0.0
    return {
        "T": T, "B": B, "mesh": f"d{d}xt{t}", "cand_budget": cand_budget,
        "collective_bytes": colls, "collective_total": coll_total,
        "compute_bytes_per_dev": round(comp_bytes / (d * t)),
        "proj_hbm_ms": round(hbm_t * 1e3, 3),
        "proj_ici_ms": round(ici_t * 1e3, 3),
        "comm_share_pct": round(share * 100, 2),
    }


def measure_screened(T: int, B: int, d: int, t: int, cand_budget: int):
    """Same model for the sharded two-pass screened step
    (_make_screened_step_sharded).  Static shapes bound the pair gather
    by pair_budget, so compute bytes are a worst case; collective bytes
    are exact (O(budget), independent of T)."""
    import jax
    from jax.sharding import Mesh

    from kmcp_tpu.search.device import _make_screened_step_sharded

    K = 131
    t_block = 4096
    nb = max(T // t_block, t)
    s_block = 16 * 1024
    s_union = 32 * (T * 1400 // t_block) // 8  # ~3.5 bits/k-mer unions
    pair_budget = max(256, 2 * cand_budget)
    devs = np.array(jax.devices("cpu")[: d * t]).reshape(d, t)
    mesh = Mesh(devs, axis_names=("d", "t"))
    step = _make_screened_step_sharded(
        cand_budget, pair_budget, 30, 256, nb, t_block, s_block, mesh
    )

    Wu = -(-nb // 32)
    bits = jax.ShapeDtypeStruct((s_block + 1, nb * (t_block // 32)),
                                np.uint32)
    u_ext = jax.ShapeDtypeStruct((s_union + 1, Wu), np.uint32)
    loc = jax.ShapeDtypeStruct((B, K), np.int32)
    locu = jax.ShapeDtypeStruct((B, K), np.int32)
    nk = jax.ShapeDtypeStruct((B,), np.int32)
    lens = jax.ShapeDtypeStruct((B,), np.int32)
    cmin = jax.ShapeDtypeStruct((K + 1,), np.int32)
    theta = jax.ShapeDtypeStruct((nb, K + 1), np.int32)
    tmin = jax.ShapeDtypeStruct((nb * t_block,), np.int32)
    spos = jax.ShapeDtypeStruct((nb * t_block,), bool)

    compiled = step.lower(
        bits, u_ext, loc, locu, nk, lens, cmin, theta, tmin, spos
    ).compile()
    colls = collective_bytes(compiled.as_text())
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    comp_bytes = float(ca.get("bytes accessed", 0.0))
    coll_total = sum(colls.values())
    hbm_t = comp_bytes / (d * t) / HBM_BPS
    ici_t = coll_total / ICI_BPS
    share = ici_t / (ici_t + hbm_t) if (ici_t + hbm_t) else 0.0
    return {
        "step": "screened", "T": nb * t_block, "B": B,
        "mesh": f"d{d}xt{t}", "cand_budget": cand_budget,
        "collective_bytes": colls, "collective_total": coll_total,
        "compute_bytes_per_dev": round(comp_bytes / (d * t)),
        "proj_hbm_ms": round(hbm_t * 1e3, 3),
        "proj_ici_ms": round(ici_t * 1e3, 3),
        "comm_share_pct": round(share * 100, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    grid = []
    for T in (2048, 16384, 131072):
        for B in (256, 1024):
            for d, t in ((1, 8), (2, 4), (8, 1)):
                grid.append((T, B, d, t, 4 * B))

    rows = []
    for T, B, d, t, cb in grid:
        r = measure(T, B, d, t, cb)
        rows.append(r)
        print(
            f"T={T:>6} B={B:>5} mesh=d{d}xt{t} "
            f"coll={r['collective_total']:>9} B "
            f"hbm={r['proj_hbm_ms']:>8.3f} ms "
            f"ici={r['proj_ici_ms']:>7.3f} ms "
            f"share={r['comm_share_pct']:>6.2f}% "
            f"{r['collective_bytes']}",
            file=sys.stderr, flush=True,
        )
    for B in (1024,):
        for d, t in ((1, 8), (2, 4), (8, 1)):
            r = measure_screened(131072, B, d, t, 4 * B)
            rows.append(r)
            print(
                f"SCREENED T={r['T']:>6} B={B:>5} mesh=d{d}xt{t} "
                f"coll={r['collective_total']:>9} B "
                f"hbm={r['proj_hbm_ms']:>8.3f} ms "
                f"ici={r['proj_ici_ms']:>7.3f} ms "
                f"share={r['comm_share_pct']:>6.2f}%",
                file=sys.stderr, flush=True,
            )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
