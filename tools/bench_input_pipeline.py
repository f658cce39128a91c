"""Isolate the input-pipeline bottleneck: host loader vs H2D transfer vs
device augmentation vs train step. Run on an idle chip."""

from __future__ import annotations

import os as _os
import sys as _sys

# runnable both as `python -m tools.<name>` (repo root on path) and
# as a direct script (only tools/ on path): make repo-root imports
# (bench, cnn_tpu) resolve either way
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp
import numpy as np


_sum1 = None


def sync(x):
    """Force completion with a device-side reduction + scalar fetch."""
    global _sum1
    if _sum1 is None:
        _sum1 = jax.jit(lambda a: jnp.sum(a.ravel()[:8].astype(jnp.float32)))
    return float(_sum1(x))


def main():
    from cnn_tpu import optim
    from cnn_tpu.data import DataLoader, discover_dataset
    from cnn_tpu.models import AlexNet
    from cnn_tpu.ops.augment import augment_batch
    from cnn_tpu.parallel import create_train_state, make_train_step

    bs = 64
    print(f"backend: {jax.default_backend()}, bs={bs}")

    # 1) host loader, cached resized canvases (device-augment feed path)
    samples = discover_dataset("/root/reference/datasets/animals", ["dog"])[:256]
    loader = DataLoader(samples, batch_size=bs, augment=False, shuffle=True,
                        image_size=256, cache=True, num_workers=4, prefetch=8)
    for _ in range(8):  # fill cache
        loader.generate_batch()
    t0 = time.perf_counter()
    n = 30
    for _ in range(n):
        imgs, labels = loader.generate_batch()
    dt = (time.perf_counter() - t0) / n
    print(f"host loader (cached, 256px):     {1e3*dt:7.2f} ms/batch  {bs/dt:8.0f} img/s")
    loader.close()

    # 2) H2D transfer of one uint8 batch
    batch = np.ascontiguousarray(imgs)
    t0 = time.perf_counter()
    for _ in range(n):
        dev = jax.device_put(batch)
        sync(dev.astype(jnp.float32))
    dt = (time.perf_counter() - t0) / n
    print(f"H2D 256px uint8 + touch:         {1e3*dt:7.2f} ms/batch  {bs/dt:8.0f} img/s")

    # 3) device augmentation alone (input resident)
    dev = jax.device_put(batch)
    k = jax.random.key(0)
    out = augment_batch(k, dev); sync(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = augment_batch(jax.random.fold_in(k, i), dev)
    sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"device augment 256->224:         {1e3*dt:7.2f} ms/batch  {bs/dt:8.0f} img/s")

    # 4) full train step without augment (224 uint8 resident)
    model = AlexNet(num_classes=3, batch_norm=True)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    ts = create_train_state(model, opt, jax.random.key(0))
    step = make_train_step(model, opt)
    x = jnp.zeros((bs, 224, 224, 3), jnp.uint8)
    y = jnp.zeros((bs,), jnp.int32)
    ts, m = step(ts, x, y); float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        ts, m = step(ts, x, y)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"train step bs={bs} (no augment):  {1e3*dt:7.2f} ms/batch  {bs/dt:8.0f} img/s")

    # 5) train step with fused device augment (256 canvas resident)
    model2 = AlexNet(num_classes=3, batch_norm=True)
    ts2 = create_train_state(model2, opt, jax.random.key(0))
    step2 = make_train_step(model2, opt, augment_fn=lambda r, im: augment_batch(r, im))
    x2 = jnp.zeros((bs, 256, 256, 3), jnp.uint8)
    ts2, m2 = step2(ts2, x2, y); float(m2["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        ts2, m2 = step2(ts2, x2, y)
    float(m2["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"train step + fused augment:      {1e3*dt:7.2f} ms/batch  {bs/dt:8.0f} img/s")


if __name__ == "__main__":
    main()
