"""Spot-check peak device memory of the jitted _reverse_core at a
long-read / wide-window shape (advisor round 4, finding 3): the per-chunk
int8 profile-slab gathers in pallas_sw.forward_perread_ref were sequenced
eagerly to bound the transient; jitting the whole reverse chain into one
XLA program (round 4) could in principle let the scheduler widen the live
ranges.  This measures it instead of assuming.

Run on the TPU:  python tools/spotcheck_revmem.py [B L W]
Prints one dict line: shape, slab bytes/chunk, peak_bytes from
device.memory_stats() (when the platform reports it), wall.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    B, L, W = (int(x) for x in sys.argv[1:4]) if len(sys.argv) > 3 else (
        256, 1024, 8192)
    import jax
    import jax.numpy as jnp
    from ssw_tpu import pipeline
    from ssw_tpu.ops import common, pallas_sw

    rng = np.random.default_rng(0)
    n = 4
    mat = np.array([[2 if i == j else -2 for j in range(n + 1)]
                    for i in range(n + 1)], np.int8)
    mat[n, :] = 0
    mat[:, n] = 0
    ref = rng.integers(0, n, 1 << 20, dtype=np.int8)
    Rp = common.bucket_size(len(ref), 256)
    ref_dev = pipeline._device_ref(ref, n, Rp)
    reads = rng.integers(0, n, (B, L), dtype=np.int8)
    er = rng.integers(W, len(ref) - 1, B).astype(np.int32)
    ed = np.full(B, L - 1, np.int32)
    score1 = np.full(B, 10 ** 6, np.int32)  # no early terminate: worst case

    dev = jax.devices()[0]
    stats0 = getattr(dev, "memory_stats", lambda: None)() or {}
    t0 = time.perf_counter()
    out = pipeline._reverse_core(
        jnp.asarray(reads), jnp.asarray(er), jnp.asarray(ed),
        jnp.asarray(score1), ref_dev,
        jnp.asarray(common.extend_matrix(mat)),
        L=L, W=W, n=n, gapO=3, gapE=1, quirk=False, tier_word=True,
        pallas=(dev.platform != "cpu"))
    np.asarray(out)  # force (block_until_ready unreliable on axon)
    wall = time.perf_counter() - t0
    stats1 = getattr(dev, "memory_stats", lambda: None)() or {}
    b_opt = max(8, (pallas_sw.OPT_LANES // L) // 8 * 8)
    slab = b_opt * W * L  # int8 bytes per chunk gather
    print({"B": B, "L": L, "W": W, "chunks": -(-B // b_opt),
           "slab_bytes_per_chunk": slab,
           "peak_bytes_in_use": stats1.get("peak_bytes_in_use"),
           "peak_before": stats0.get("peak_bytes_in_use"),
           "bytes_limit": stats1.get("bytes_limit"),
           "wall_s": round(wall, 2)}, flush=True)


if __name__ == "__main__":
    main()
