"""Multi-host coverage of the round-3/4 surfaces (VERDICT r3 item 6).

Extends ``multihost_smoke`` (the GSPMD train step across processes) to the
explicit-collective paths: the pipeline-parallel step with the 'data' axis
spanning REAL process boundaries, the 3-axis DP x PP x TP mesh, and the
epoch-permutation sampler's exactly-once property over process-local shards.
Every process runs this same program; on CPU this exercises the exact code
that runs over ICI/DCN on a pod.

Run (each process):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python -m cnn_tpu.tools.multihost_pp_smoke \
        --coordinator localhost:9876 --num-processes 2 --process-id {0,1}

Prints ``PP OK``, ``PP-1F1B OK``, ``PP3 OK`` and ``EPOCH OK`` lines; the
replicated losses are identical on every process, and the 1F1B loss equals
the GPipe loss (same math, different schedule — VERDICT r4 item 3: the
hand-scheduled backward's ppermute hops and psum'd head grads crossing a
REAL process boundary).
"""

from __future__ import annotations

import argparse
import sys
from collections import Counter


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    args = ap.parse_args(argv)

    import jax

    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cnn_tpu import optim
    from cnn_tpu.models import PipeCNN
    from cnn_tpu.parallel import (create_train_state, make_pp_train_step,
                                  shard_pp_train_state)

    devs = jax.devices()
    dp = jax.process_count()
    stages = len(devs) // dp
    assert stages >= 2, (len(devs), dp)
    # process-major device order: the 'data' axis rows land one per process
    mesh = Mesh(np.asarray(devs).reshape(dp, stages), ("data", "stage"))
    print(f"process {jax.process_index()}/{dp}: pp mesh "
          f"{dict(mesh.shape)}", flush=True)

    model = PipeCNN(num_classes=3, width=8, n_blocks=2 * stages,
                    image_size=32)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts = shard_pp_train_state(
        create_train_state(model, opt, jax.random.key(0)), mesh, model)

    # global batch from process-local shards (each process contributes its
    # 'data' rows)
    per_proc = 8
    global_bs = per_proc * dp
    rng = np.random.default_rng(jax.process_index())
    x_sh = NamedSharding(mesh, P("data", None, None, None))
    y_sh = NamedSharding(mesh, P("data"))
    x = jax.make_array_from_process_local_data(
        x_sh, rng.integers(0, 256, (per_proc, 32, 32, 3), np.uint8),
        (global_bs, 32, 32, 3))
    y = jax.make_array_from_process_local_data(
        y_sh, (np.arange(per_proc, dtype=np.int32)
               + per_proc * jax.process_index()) % 3, (global_bs,))

    step = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                              donate=False)
    for _ in range(2):
        ts, metrics = step(ts, x, y)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    assert int(ts.step) == 2
    print(f"PP OK loss={loss:.6f}", flush=True)

    # ---- 1F1B: same two steps from the same init, across the same real
    # process boundary — must equal the GPipe losses (schedule equivalence
    # holds when the backward ppermutes and the psum'd head grads cross
    # processes, not just virtual devices) ----
    fts = shard_pp_train_state(
        create_train_state(model, opt, jax.random.key(0)), mesh, model)
    fstep = make_pp_train_step(model, opt, mesh, n_microbatches=2,
                               donate=False, schedule="1f1b")
    for _ in range(2):
        fts, fmetrics = fstep(fts, x, y)
    floss = float(fmetrics["loss"])
    assert np.isfinite(floss), floss
    assert abs(floss - loss) < 1e-5, (
        f"1F1B loss {floss} != GPipe loss {loss} across processes")
    print(f"PP-1F1B OK loss={floss:.6f} (== gpipe)", flush=True)

    # ---- 3-axis DP x PP x TP, the data axis still across processes ----
    if stages >= 4:
        mesh3 = Mesh(np.asarray(devs).reshape(dp, stages // 2, 2),
                     ("data", "stage", "model"))
        tmodel = PipeCNN(num_classes=3, width=8, n_blocks=stages,
                         image_size=32, dropout=0.25)
        tts = shard_pp_train_state(
            create_train_state(tmodel, opt, jax.random.key(1)), mesh3,
            tmodel)
        tstep = make_pp_train_step(tmodel, opt, mesh3, n_microbatches=2,
                                   donate=False)
        tts, tmetrics = tstep(tts, x, y)
        tloss = float(tmetrics["loss"])
        assert np.isfinite(tloss), tloss
        print(f"PP3 OK loss={tloss:.6f}", flush=True)

    # ---- epoch sampler: exactly-once across process-local shards ----
    from cnn_tpu.data.device_dataset import DeviceDataset, _make_epoch_sampler

    n, bs = 16 * dp, 8
    ids = np.arange(n, dtype=np.int32)  # unique ids as labels
    ds = DeviceDataset.from_arrays(
        np.zeros((n, 8, 8, 3), np.uint8), ids, mesh=mesh)
    sampler = jax.jit(_make_epoch_sampler(ds, bs, mesh, fixed=False))
    # my process's local dataset rows (data-shard rows live here; dedupe
    # the 'stage' replicas by replica_id)
    local_rows = Counter()
    for s in ds.labels.addressable_shards:
        if s.replica_id == 0:
            local_rows.update(np.asarray(s.data).tolist())
    seen = Counter()
    key = jax.random.key(7)
    for step_i in range(n // bs):  # one full epoch
        _, yb = sampler(key, jnp.int32(step_i), ds.images, ds.labels)
        for s in yb.addressable_shards:
            if s.replica_id == 0:
                seen.update(np.asarray(s.data).tolist())
    assert seen == local_rows, (
        f"epoch sampling not exactly-once on process {jax.process_index()}: "
        f"missing={sorted(local_rows - seen)} extra={sorted(seen - local_rows)}")
    print(f"EPOCH OK rows={sum(local_rows.values())}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
