"""Multi-host SPMD smoke: N processes, one global mesh, one train step.

This is the executable proof of the multi-host story (SURVEY.md §5.8): every
process runs this same program, ``jax.distributed.initialize`` wires the
coordination service, the mesh spans ALL processes' devices, each process
contributes its local shard of the global batch via
``jax.make_array_from_process_local_data``, and XLA reduces gradients with
collectives. On CPU this validates the exact code path that runs over
ICI/DCN on a real pod (no TPU multi-chip hardware is available here).

Run (each process):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=2 \
    python -m cnn_tpu.tools.multihost_smoke \
        --coordinator localhost:9876 --num-processes 2 --process-id {0,1}

Prints ``MULTIHOST OK loss=<x>`` — identical loss on every process.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args(argv)

    import jax

    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cnn_tpu import optim
    from cnn_tpu.models import AlexNet
    from cnn_tpu.parallel import create_train_state, make_train_step

    devs = jax.devices()                       # GLOBAL device list
    mesh = Mesh(np.asarray(devs), ("data",))
    print(f"process {jax.process_index()}/{jax.process_count()}: "
          f"{jax.local_device_count()} local of {len(devs)} global devices",
          flush=True)

    model = AlexNet(num_classes=3, image_size=64)
    opt = optim.sgd(1e-2)

    # replicate the state across the global mesh: build it inside jit with
    # replicated out-shardings (device_put cannot target non-addressable
    # devices directly)
    replicated = NamedSharding(mesh, P())
    ts = jax.jit(
        lambda k: create_train_state(model, opt, k),
        out_shardings=jax.tree_util.tree_map(lambda _: replicated,
                                             create_train_state(model, opt,
                                                                jax.random.key(0))),
    )(jax.random.key(0))

    # global batch: each process contributes its LOCAL shard
    per_proc = 2 * jax.local_device_count()
    global_bs = per_proc * jax.process_count()
    rng = np.random.default_rng(jax.process_index())
    local_x = rng.integers(0, 256, (per_proc, 64, 64, 3), np.uint8)
    local_y = (np.arange(per_proc, dtype=np.int32)
               + per_proc * jax.process_index()) % 3
    x_sh = NamedSharding(mesh, P("data", None, None, None))
    y_sh = NamedSharding(mesh, P("data"))
    x = jax.make_array_from_process_local_data(x_sh, local_x,
                                               (global_bs, 64, 64, 3))
    y = jax.make_array_from_process_local_data(y_sh, local_y, (global_bs,))

    step = make_train_step(model, opt, mesh=mesh, donate=False)
    loss = None
    for _ in range(args.steps):
        ts, metrics = step(ts, x, y)
        loss = float(metrics["loss"])   # fully-replicated scalar: fetch ok
    assert np.isfinite(loss), loss
    assert int(ts.step) == args.steps

    # the HBM-resident dataset path also spans hosts: each process uploads
    # only its local shard (make_array_from_process_local_data) and samples
    # shard-locally — zero cross-host input traffic
    from cnn_tpu.data.device_dataset import DeviceDataset, make_device_train_step

    n = 4 * len(devs)
    imgs = np.tile(np.arange(n, dtype=np.uint8)[:, None, None, None],
                   (1, 64, 64, 3))
    ds = DeviceDataset.from_arrays(imgs, np.arange(n, dtype=np.int32) % 3,
                                   mesh=mesh)
    dstep = make_device_train_step(model, opt, ds, len(devs) * 2,
                                   donate=False, mesh=mesh)
    ts, metrics = dstep(ts)
    dloss = float(metrics["loss"])
    assert np.isfinite(dloss), dloss
    print(f"MULTIHOST OK loss={loss:.6f} device_ds_loss={dloss:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
