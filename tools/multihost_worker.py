"""One process of a multi-host sharded search (tools/multihost_worker.py
PROC_ID NPROCS PORT).

Each process owns half the targets' bit-matrix words (the reference's
per-node sub-database, kmcp/cmd/merge.go cluster story) and the full
read batch; the global (d, t) mesh step counts matches with zero
cross-host movement of DB rows, then per-target counts all-gather for
verification against a single-process NumPy oracle.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from kmcp_tpu.parallel import distributed as D

D.init_distributed(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs,
    process_id=proc_id,
    cpu_devices_per_process=4,
)

import numpy as np

from kmcp_tpu.parallel.sharding import host_locations

rng = np.random.default_rng(0)  # identical on every process
S, W, B, K, H = 4096, 8, 64, 100, 1
W_global = W * nprocs
bits_full = rng.integers(0, 2**32, size=(S, W_global), dtype=np.uint32)
hashes = rng.integers(1, 2**63, size=(B, K), dtype=np.uint64)
mask = rng.random((B, K)) < 0.9
loc = host_locations(hashes, H, S).reshape(B, K, H)

mesh = D.make_multihost_mesh()
assert mesh.devices.shape == (4, nprocs), mesh.devices.shape

bits_local = bits_full[:, proc_id * W : (proc_id + 1) * W]
g_bits = D.bits_to_global(mesh, np.ascontiguousarray(bits_local))
g_loc, g_mask = D.reads_to_global(mesh, loc, mask)

step = D.make_multihost_search_step(mesh, num_hashes=H)
counts, n_matched, best = step(g_bits, g_loc, g_mask)
counts_all = D.allgather_counts(counts)

# single-process oracle over the FULL matrix
rows = bits_full[loc[..., 0]]  # [B, K, W_global]
rows = np.where(mask[..., None], rows, np.uint32(0))
bitsum = np.unpackbits(
    rows.view(np.uint8), axis=-1, bitorder="little"
).reshape(B, K, W_global * 32)
want = bitsum.sum(axis=1, dtype=np.int32)

assert counts_all.shape == want.shape, (counts_all.shape, want.shape)
assert np.array_equal(counts_all, want), "multihost counts != oracle"
print(f"proc {proc_id}: OK counts[{counts_all.shape}] == oracle", flush=True)

# ---- phase 2: the two-pass SCREENED sharded step across processes
# (device.py::_make_screened_step_sharded — blocks over 't' spanning
# hosts, reads over local devices) vs a NumPy oracle of the same
# two-pass semantics.
import jax
from jax.experimental import multihost_utils
from jax.sharding import PartitionSpec as P

from kmcp_tpu.search.device import _make_screened_step_sharded

nb = 4 * nprocs          # blocks must divide the 't' axis
t_block = 64             # 2 words per block
W_b = t_block // 32
s_block = 512
s_union = 4096
B2, K2 = 48, 60
budget = 512

rng2 = np.random.default_rng(7)  # identical on every process
# ~12.5% bit fill (AND of three uniform words): cmin 14 keeps a few
# hundred candidates (283 with this seed) under the 512 budget
bits2 = (
    rng2.integers(0, 2**32, size=(s_block + 1, nb * W_b), dtype=np.uint32)
    & rng2.integers(0, 2**32, size=(s_block + 1, nb * W_b), dtype=np.uint32)
    & rng2.integers(0, 2**32, size=(s_block + 1, nb * W_b), dtype=np.uint32)
)
bits2[s_block, :] = 0  # sentinel row
Wu = -(-nb // 32)
u2 = rng2.integers(0, 2**32, size=(s_union + 1, Wu), dtype=np.uint32)
u2[s_union, :] = 0
loc2 = rng2.integers(0, s_block, size=(B2, K2)).astype(np.int32)
locu2 = rng2.integers(0, s_union, size=(B2, K2)).astype(np.int32)
nk2 = np.full(B2, K2, dtype=np.int32)
lens2 = np.full(B2, 150, dtype=np.int32)
cmin2 = np.full(K2 + 1, 14, dtype=np.int32)
theta2 = np.full((nb, K2 + 1), K2 // 2, dtype=np.int32)  # ~50% active
tmin2 = np.ones(nb * t_block, dtype=np.int32)
spos2 = np.ones(nb * t_block, dtype=bool)

step2 = _make_screened_step_sharded(
    budget, 2 * budget, 30, 256, nb, t_block, s_block, mesh
)
g_bits2 = multihost_utils.host_local_array_to_global_array(
    bits2[:, proc_id * (nb // nprocs) * W_b
          : (proc_id + 1) * (nb // nprocs) * W_b],
    mesh, P(None, "t"),
)
arr2 = np.asarray(
    jax.block_until_ready(
        step2(g_bits2, u2, loc2, locu2, nk2, lens2, cmin2, theta2,
              tmin2, spos2)
    )
)
n2 = int(arr2[0])
assert n2 <= budget, "screened multihost budget overflow"
got2 = set(
    zip(arr2[1 : 1 + n2].tolist(),
        arr2[1 + budget : 1 + budget + n2].tolist())
)

# numpy oracle of the two-pass semantics over the full arrays
ub = np.unpackbits(
    u2[locu2].view(np.uint8), axis=-1, bitorder="little"
).reshape(B2, K2, Wu * 32)[:, :, :nb]
ucnt = ub.sum(axis=1)
active = ucnt >= theta2[:, K2].T
T2 = nb * t_block
want2 = set()
for b in range(B2):
    for g in range(nb):
        if not active[b, g]:
            continue
        rows2 = bits2[:, g * W_b : (g + 1) * W_b][loc2[b]]
        cb = np.unpackbits(
            rows2.view(np.uint8), axis=-1, bitorder="little"
        ).reshape(K2, t_block).sum(axis=0)
        for tl in range(t_block):
            c = int(cb[tl])
            if c >= 14 and c >= 1:
                want2.add((b * T2 + g * t_block + tl, c))
assert want2, "degenerate oracle: no candidates"
assert got2 == want2, (
    f"screened multihost != oracle ({len(got2)} vs {len(want2)})"
)
print(f"proc {proc_id}: OK screened sharded step == oracle "
      f"({len(want2)} candidates)", flush=True)
