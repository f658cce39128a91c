"""Benchmark Pallas kernels vs their XLA twins on real TPU hardware.

Run: python tools/bench_kernels.py
Numbers decide the default path per shape (documented in the kernel files).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu import ops
from cnn_tpu.ops.pallas import (conv2d_bias_relu_pallas, max_pool2d_pallas,
                                uint8_normalize_pallas)
from cnn_tpu.ops.preprocess import uint8_to_float


_reduce = None


def timeit(fn, *args, iters=30):
    # Chain iters dispatches, then force completion with a device-side
    # reduction and a SCALAR fetch — on this tunneled setup fetching a full
    # tensor costs hundreds of ms and block_until_ready doesn't block.
    global _reduce
    if _reduce is None:
        _reduce = jax.jit(lambda o: jnp.sum(o[(0,) * (o.ndim - 1)][:1].astype(jnp.float32)))
    out = fn(*args)
    float(_reduce(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(_reduce(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def correctness(tag, a, b, exact=False, tol=1e-5):
    a, b = np.asarray(a), np.asarray(b)
    dev = np.abs(a.astype(np.float64) - b.astype(np.float64)).max()
    ok = (dev == 0.0) if exact else (dev <= tol)
    print(f"  correctness[{tag}]: max dev {dev:.2e} {'OK' if ok else 'FAIL'}")
    return ok


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")

    # ---- normalize ----
    x = jnp.asarray(rng.integers(0, 256, (256, 224, 224, 3), dtype=np.uint8))
    f_pl = jax.jit(uint8_normalize_pallas)
    f_xla = jax.jit(uint8_to_float)
    correctness("normalize", f_pl(x), f_xla(x), tol=2e-7)
    t_pl, t_xla = timeit(f_pl, x), timeit(f_xla, x)
    print(f"normalize bs=256: pallas {1e3*t_pl:.3f} ms | xla {1e3*t_xla:.3f} ms")

    # ---- maxpool fwd+bwd (the conv1->pool shape: 111x111x16) ----
    x = jnp.asarray(rng.standard_normal((256, 111, 111, 16)).astype(np.float32))
    g_shape = (256, 55, 55, 16)
    g = jnp.asarray(rng.standard_normal(g_shape).astype(np.float32))

    def pool_pl(x, g):
        out, vjp = jax.vjp(max_pool2d_pallas, x)
        return out, vjp(g)[0]

    def pool_xla(x, g):
        out, vjp = jax.vjp(lambda a: ops.max_pool2d(a, 2, 2), x)
        return out, vjp(g)[0]

    pool_pl_j, pool_xla_j = jax.jit(pool_pl), jax.jit(pool_xla)
    o1, d1 = pool_pl_j(x, g)
    o2, d2 = pool_xla_j(x, g)
    correctness("pool fwd", o1, o2, exact=True)
    correctness("pool bwd", d1, d2, exact=True)
    t_pl, t_xla = timeit(pool_pl_j, x, g), timeit(pool_xla_j, x, g)
    print(f"maxpool fwd+bwd bs=256: pallas {1e3*t_pl:.3f} ms | xla {1e3*t_xla:.3f} ms")

    # ---- fused conv+bias+relu, each model layer shape ----
    # conv1's full-image block (224x224, Cin=3 padded to 128 lanes) exceeds
    # VMEM — measured at a reduced spatial extent; conv2-4 are the real
    # model shapes. See the conv.py docstring for the default-path verdict.
    layer_shapes = [
        ("conv1@64", (128, 64, 64, 3), 3, 16),
        ("conv2", (128, 55, 55, 16), 16, 32),
        ("conv3", (128, 27, 27, 32), 32, 64),
        ("conv4", (128, 13, 13, 64), 64, 128),
    ]
    for name, shape, cin, cout in layer_shapes:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        p = ops.conv2d_init(jax.random.key(0), cin, cout, 3)
        f_pl = jax.jit(lambda x, w, b: conv2d_bias_relu_pallas(x, w, b, 2, True))
        f_xla = jax.jit(lambda x, w, b: ops.relu(ops.conv2d({"w": w, "b": b}, x, 2)))
        a = f_pl(x, p["w"], p["b"])
        bb = f_xla(x, p["w"], p["b"])
        correctness(name, a, bb, tol=1e-4)
        t_pl = timeit(f_pl, x, p["w"], p["b"], iters=20)
        t_xla = timeit(f_xla, x, p["w"], p["b"], iters=20)
        print(f"{name} {shape}: pallas {1e3*t_pl:.3f} ms | xla {1e3*t_xla:.3f} ms")


if __name__ == "__main__":
    main()
