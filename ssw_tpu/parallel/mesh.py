"""Device mesh construction for the alignment engine.

Axes (the reference is single-threaded — ref: src/main.c:462 — so this layer
is new TPU-native design, see SURVEY.md section 2.3):

  data  — read batches (data parallelism across chips/hosts; DCN-friendly,
          no per-column communication)
  seq   — reference columns (sequence/context parallelism for huge targets;
          per-shard DP with halo re-compute, best-hit merge over ICI)
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int | None = None, seq: int = 1,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if data is None:
        data = devices.size // seq
    assert data * seq <= devices.size, (data, seq, devices.size)
    dev = devices[: data * seq].reshape(data, seq)
    return Mesh(dev, axis_names=("data", "seq"))
