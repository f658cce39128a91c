"""Quantify GPipe's per-microbatch BatchNorm statistics (VERDICT r2 item 7).

The pipeline (parallel/pipeline.py) computes BN batch stats per microbatch
— standard GPipe semantics, documented but previously unmeasured. This
reproduces those exact semantics on ONE chip: the batch splits into M
chunks, each chunk's forward uses its own batch stats and updates the
moving stats (exactly what a pipeline stage does per tick), and gradients
accumulate across chunks before one optimizer step. M=1 is the full-batch
control. Trains pipecnn on the real dog/panda/bird dataset and reports
valid accuracy per M.

Run from the repo root: ``python -m tools.bench_bn_microbatch``.
"""

from __future__ import annotations

import os as _os
import sys as _sys

# runnable both as `python -m tools.<name>` (repo root on path) and
# as a direct script (only tools/ on path): make repo-root imports
# (bench, cnn_tpu) resolve either way
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu import optim
from cnn_tpu.data.dataset import discover_dataset, split_dataset
from cnn_tpu.data.device_dataset import DeviceDataset
from cnn_tpu.models import get_model
from cnn_tpu.ops.preprocess import uint8_to_float
from cnn_tpu.parallel import create_train_state, make_eval_step
from cnn_tpu.parallel.train_step import TrainState, _loss_fn


def make_microbatch_bn_step(model, optimizer, dataset, batch_size, M, *,
                            compute_dtype=jnp.bfloat16):
    """One optimizer step = M sequential microbatch fwd/bwd with
    per-microbatch BN stats (the GPipe semantics), grads averaged."""

    def step(ts: TrainState, images_ref, labels_ref):
        rng = jax.random.fold_in(ts.rng, ts.step)
        k_sample, k_model = jax.random.split(rng)
        idx = jax.random.randint(k_sample, (batch_size,), 0, dataset.n)
        images = uint8_to_float(jnp.take(images_ref, idx, axis=0),
                                compute_dtype)
        labels = jnp.take(labels_ref, idx, axis=0)
        x_mb = images.reshape(M, batch_size // M, *images.shape[1:])
        y_mb = labels.reshape(M, batch_size // M)

        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)

        def micro(carry, mb):
            state, gacc, lacc, cacc = carry
            (loss, (new_state, correct)), g = grad_fn(
                ts.params, state, model, mb["x"], mb["y"], k_model, True,
                compute_dtype, False, 0.0)
            gacc = jax.tree.map(jnp.add, gacc, g)
            return (new_state, gacc, lacc + loss, cacc + correct), None

        gz = jax.tree.map(jnp.zeros_like, ts.params)
        (new_state, gsum, lsum, csum), _ = jax.lax.scan(
            micro, (ts.state, gz, 0.0, 0), {"x": x_mb, "y": y_mb})
        grads = jax.tree.map(lambda g: g / M, gsum)
        new_params, new_opt = optimizer.update(grads, ts.opt_state, ts.params)
        new_ts = TrainState(new_params, new_state, new_opt, ts.step + 1,
                            ts.rng)
        return new_ts, {"loss": lsum / M, "correct": csum}

    jitted = jax.jit(step, donate_argnums=(0,))
    return lambda ts: jitted(ts, dataset.images, dataset.labels)


def run(M: int, iters: int = 3000, batch_size: int = 256) -> float:
    model = get_model("pipecnn", num_classes=3, width=32, n_blocks=4,
                      image_size=224)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9, schedule="cosine",
                               total_steps=iters)
    ts = create_train_state(model, opt, jax.random.key(0))
    samples = discover_dataset("/root/reference/datasets/animals",
                               ("dog", "panda", "bird"))
    splits = split_dataset(samples, 0.8, 0.1, 212)
    train_ds = DeviceDataset(splits["train"], image_size=224)
    valid_ds = DeviceDataset(splits["valid"], image_size=224)

    step = make_microbatch_bn_step(model, opt, train_ds, batch_size, M)
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, m = step(ts)
    float(m["loss"])
    dt = time.perf_counter() - t0

    ev = make_eval_step(model, compute_dtype=jnp.bfloat16)
    correct = total = 0
    for x, y in valid_ds.epoch_batches(64):
        out = ev(ts.params, ts.state, x, y)
        correct += int(out["correct"])
        total += int(x.shape[0])
    return correct / total, dt


def main():
    out = {}
    for M in (1, 4, 16):
        acc, dt = run(M)
        out[f"M{M}"] = {"valid_acc": round(acc, 4), "bn_batch": 256 // M,
                        "train_s": round(dt, 1)}
        print(json.dumps({f"M{M}": out[f"M{M}"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
