"""Device mesh construction.

The reference has zero parallelism (single thread, single device — SURVEY.md
§2). The TPU-native replacement: an explicit 2-axis ``('data', 'model')``
mesh; the batch shards over 'data' (DP over ICI), and the classifier head /
wide conv channels may shard over 'model' (TP). With one chip both axes are
1 and everything degenerates to plain jit — the mesh axis stays explicit so
multi-chip (and multi-host DCN) falls out with no code change.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data_parallel: int = 0, model_parallel: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. data_parallel=0 means 'use all'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data_parallel <= 0:
        assert n % model_parallel == 0, (n, model_parallel)
        data_parallel = n // model_parallel
    need = data_parallel * model_parallel
    assert need <= n, f"need {need} devices, have {n}"
    arr = np.asarray(devices[:need]).reshape(data_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))
