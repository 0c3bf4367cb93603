"""Batched TPU-native usage — the capability the reference never had.

Aligns a batch of reads against one target in a single device round-trip,
and shows the sharded (multi-chip) variant on whatever mesh is available.

Run:  python examples/example_batch_tpu.py
      XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
          python examples/example_batch_tpu.py   # fake 8-chip mesh
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from ssw_tpu import api, pipeline
from ssw_tpu.core.encoding import dna_matrix, encode_dna


def main():
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = rng.choice(bases, 4096).tobytes().decode()
    reads = []
    for _ in range(64):
        off = int(rng.integers(0, 4000))
        read = list(ref[off:off + 96])
        for j in range(0, 96, 17):           # sprinkle mismatches
            read[j] = "ACGT"[(ord(read[j]) + 1) % 4]
        reads.append("".join(read))

    mat = dna_matrix(2, 2)
    results = api.align_batch([encode_dna(r) for r in reads],
                              encode_dna(ref), mat, gapO=3, gapE=1,
                              mask_len=48)
    print(f"aligned {len(results)} reads on {jax.devices()[0].platform}; "
          f"first: score={results[0].score1} "
          f"ref=[{results[0].ref_begin1},{results[0].ref_end1}]")

    n_dev = len(jax.devices())
    if n_dev > 1:
        from ssw_tpu.parallel import mesh as mesh_lib
        seq = 2 if n_dev % 2 == 0 else 1
        mesh = mesh_lib.make_mesh(data=n_dev // seq, seq=seq)
        req = pipeline.BatchRequest(
            reads=[encode_dna(r) for r in reads], ref=encode_dna(ref),
            mat=mat, gapO=3, gapE=1, mask_len=48)
        sharded = pipeline.align_batch_sharded(req, mesh)
        same = all(a.score1 == b.score1 for a, b in zip(results, sharded))
        print(f"sharded over {mesh.shape}: bit-identical={same}")


if __name__ == "__main__":
    main()
