"""Benchmark Pallas kernels vs their XLA twins on real TPU hardware.

Run: python tools/bench_kernels.py [out.json]
Numbers decide the default path per shape (documented in the kernel files);
results are committed as BENCH_kernels.json for the record.
"""

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


def main(out_path="BENCH_kernels.json"):
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")
    results = []

    def record(kernel, shape, t_pl, t_xla, default):
        results.append({
            "kernel": kernel, "shape": list(shape),
            "pallas_ms": round(1e3 * t_pl, 3), "xla_ms": round(1e3 * t_xla, 3),
            "speedup_vs_xla": round(t_xla / t_pl, 2), "default": default,
        })

    # ---- three-shear rotation (the full-augmentation hot spot) ----
    from cnn_tpu.ops.pallas.augment import rotate_shear_pallas, rotate_shear_xla
    from cnn_tpu.ops.augment import augment_batch, augment_batch_fast
    xr = jnp.asarray(rng.random((256, 256, 256, 3), np.float32))
    theta = jnp.asarray(rng.uniform(-1.2, 1.2, (256,)), jnp.float32)
    f_pl = jax.jit(rotate_shear_pallas)
    f_xla = jax.jit(rotate_shear_xla)
    correctness("rotate", f_pl(xr, theta), f_xla(xr, theta), exact=True)
    t_pl, t_xla = timeit(f_pl, xr, theta, iters=20), timeit(f_xla, xr, theta, iters=10)
    print(f"rotate bs=256: pallas {1e3*t_pl:.3f} ms | xla {1e3*t_xla:.3f} ms")
    record("rotate_shear_f32", xr.shape, t_pl, t_xla, "pallas")

    xrb = xr.astype(jnp.bfloat16)
    correctness("rotate bf16", f_pl(xrb, theta).astype(jnp.float32),
                f_xla(xrb, theta).astype(jnp.float32), exact=True)
    t_pl = timeit(f_pl, xrb, theta, iters=20)
    t_xla = timeit(f_xla, xrb, theta, iters=10)
    print(f"rotate bf16 bs=256: pallas {1e3*t_pl:.3f} ms | xla {1e3*t_xla:.3f} ms")
    record("rotate_shear_bf16", xrb.shape, t_pl, t_xla, "pallas")

    xu = jnp.asarray(rng.integers(0, 256, (256, 256, 256, 3)).astype(np.uint8))
    f_full = jax.jit(lambda k, x: augment_batch(k, x, out_size=224,
                                                dtype=jnp.bfloat16))
    f_fast = jax.jit(lambda k, x: augment_batch_fast(k, x, out_size=224,
                                                     dtype=jnp.bfloat16))
    t_full = timeit(f_full, jax.random.key(0), xu, iters=20)
    t_fast = timeit(f_fast, jax.random.key(0), xu, iters=20)
    print(f"augment full {1e3*t_full:.2f} ms vs fast {1e3*t_fast:.2f} ms "
          f"({t_full/t_fast:.2f}x)")
    results.append({"kernel": "augment_full_policy", "shape": list(xu.shape),
                    "full_ms": round(1e3 * t_full, 3),
                    "fast_ms": round(1e3 * t_fast, 3),
                    "full_over_fast": round(t_full / t_fast, 2),
                    "default": "pallas rotate inside full policy (bf16)"})

    # ---- crop-resize: banded-matmul resample vs scale_and_translate ----
    # (the matmul formulation is the fast-path default; s_a_t reconstructed
    # here as its XLA twin for the record)
    def fast_st(k, images):
        b, s = images.shape[0], images.shape[1]
        x = images.astype(jnp.bfloat16) / jnp.bfloat16(255.0)

        def one(img, key):
            k_h, k_v, k_c, k_cy, k_cx, k_do = jax.random.split(key, 6)
            img = jnp.where(jax.random.uniform(k_h) < 0.5, img[:, ::-1], img)
            img = jnp.where(jax.random.uniform(k_v) < 0.2, img[::-1], img)
            r = jnp.where(jax.random.uniform(k_do) < 0.7,
                          0.7 + jax.random.uniform(k_c) * 0.25, 1.0)
            oy = jax.random.uniform(k_cy) * (1.0 - r) * s
            ox = jax.random.uniform(k_cx) * (1.0 - r) * s
            scale = 224.0 / (r * s)
            return jax.image.scale_and_translate(
                img, (224, 224, img.shape[-1]), (0, 1),
                jnp.stack([scale, scale]),
                jnp.stack([-oy * scale, -ox * scale]), method="linear")

        return jax.vmap(one)(x, jax.random.split(k, b))

    f_st = jax.jit(fast_st)
    t_st = timeit(f_st, jax.random.key(0), xu, iters=20)
    print(f"crop-resize: matmul {1e3*t_fast:.2f} ms vs "
          f"scale_and_translate {1e3*t_st:.2f} ms ({t_st/t_fast:.2f}x)")
    results.append({"kernel": "resample_matmul_bf16", "shape": list(xu.shape),
                    "matmul_ms": round(1e3 * t_fast, 3),
                    "scale_and_translate_ms": round(1e3 * t_st, 3),
                    "speedup_vs_xla": round(t_st / t_fast, 2),
                    "default": "matmul"})

    # ---- normalize ----
    x = jnp.asarray(rng.integers(0, 256, (256, 224, 224, 3), dtype=np.uint8))
    f_pl = jax.jit(uint8_normalize_pallas)
    f_xla = jax.jit(uint8_to_float)
    correctness("normalize", f_pl(x), f_xla(x), tol=2e-7)
    t_pl, t_xla = timeit(f_pl, x), timeit(f_xla, x)
    print(f"normalize bs=256: pallas {1e3*t_pl:.3f} ms | xla {1e3*t_xla:.3f} ms")
    record("uint8_normalize", x.shape, t_pl, t_xla, "xla")

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
    record("maxpool_fwd_bwd", x.shape, t_pl, t_xla, "xla")

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
        record(f"conv_bias_relu_{name}", shape, t_pl, t_xla, "xla")

    import json
    with open(out_path, "w") as f:
        json.dump({"device": jax.devices()[0].device_kind,
                   "results": results}, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:2])
