"""Device mesh construction.

The reference has zero parallelism (single thread, single device — SURVEY.md
§2). The TPU-native replacement: an explicit ``('data', 'model'[,
'spatial'])`` mesh; the batch shards over 'data' (DP over ICI), the
classifier head / wide conv channels may shard over 'model' (TP), and
activation ROWS may shard over 'spatial' — the CNN analog of sequence
parallelism, where XLA's SPMD partitioner inserts the halo exchanges each
conv window needs at shard boundaries. With one chip every axis is 1 and
everything degenerates to plain jit — the mesh axes stay explicit so
multi-chip (and multi-host DCN) falls out with no code change.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data_parallel: int = 0, model_parallel: int = 1,
              spatial_parallel: int = 1, expert_parallel: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model'[, 'spatial'][, 'expert']) mesh; axes beyond
    the first two appear only when their size is > 1 (so the common 2-axis
    case keeps its shape everywhere). data_parallel=0 means 'use the rest'.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    extra = model_parallel * spatial_parallel * expert_parallel
    if data_parallel <= 0:
        assert n % extra == 0, (n, model_parallel, spatial_parallel,
                                expert_parallel)
        data_parallel = n // extra
    need = data_parallel * extra
    assert need <= n, f"need {need} devices, have {n}"
    dims = [("data", data_parallel), ("model", model_parallel)]
    if spatial_parallel > 1:
        dims.append(("spatial", spatial_parallel))
    if expert_parallel > 1:
        dims.append(("expert", expert_parallel))
    arr = np.asarray(devices[:need]).reshape([d for _, d in dims])
    return Mesh(arr, axis_names=tuple(name for name, _ in dims))
