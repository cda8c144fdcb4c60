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
