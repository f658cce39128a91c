"""Checkpointing.

Two formats:

1. **Native**: a pickle of the full TrainState — params, BN state, optimizer
   state, step, and RNG key. This is a strict superset of the reference,
   which persists only raw weights and loses RNG/iteration on resume
   (``alexnet.cpp:69-90``; manual ``start_iters`` at ``cnn.cpp:67``).

2. **Reference ``.model``**: the flat little-endian float32 concatenation
   written by the C++ (per-layer order at ``conv2d.cpp:220-226``,
   ``linear.cpp:105-108``, ``batchnorm2d.cpp:168-174``; whole-model order =
   layer list order, ``alexnet.cpp:69-90``). Importing these committed
   checkpoints is the numerical-parity oracle (SURVEY.md §4): RNG parity
   with C++ is impossible, so parity always flows through loaded weights.

Layout conversion (reference CHW / OIHW -> our NHWC / HWIO):
- conv kernels are stored as ``out_channels`` blocks of ``[in][kh][kw]``
  -> transpose (O,I,KH,KW) to (KH,KW,I,O).
- the dense layer's flat ``[in][out]`` weight indexes ``in`` in CHW flatten
  order (c*H*W + h*W + w); our Flatten is NHWC (h*W*C + w*C + c), so the
  in-dim is permuted via a (C,H,W) -> (H,W,C) transpose.
"""

from __future__ import annotations

import os
import pickle
import re


import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu.nn.module import BatchNorm2D, Conv2D, DepthwiseConv2D, Linear
from cnn_tpu.nn.sequential import Sequential

# ---------------------------------------------------------------- native ----


def _payload(train_state) -> dict:
    return {
        "params": jax.tree_util.tree_map(np.asarray, train_state.params),
        "state": jax.tree_util.tree_map(np.asarray, train_state.state),
        "opt_state": jax.tree_util.tree_map(np.asarray, train_state.opt_state),
        "step": int(train_state.step),
        "rng": np.asarray(jax.random.key_data(train_state.rng)),
        "format_version": 1,
    }


def save_checkpoint(path: str, train_state, backend: str = "pickle") -> None:
    """backend='pickle' writes one file; 'orbax' writes a directory
    (sharding-aware, async-capable — the idiomatic JAX store)."""
    payload = _payload(train_state)
    if backend == "orbax":
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), payload, force=True)
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


class _RestrictedUnpickler(pickle.Unpickler):
    """Data-only unpickler: a checkpoint is numpy arrays plus optax
    namedtuple state wrappers, never code. Anything else (os.system,
    subprocess, __reduce__ payloads...) is refused, so loading a checkpoint
    from a shared directory cannot execute arbitrary code."""

    _SAFE = {
        # our own inert NamedTuple state wrappers
        ("cnn_tpu.optim", "EmaState"),
        ("numpy", "ndarray"), ("numpy", "dtype"),
        ("numpy.core.multiarray", "_reconstruct"),
        ("numpy._core.multiarray", "_reconstruct"),
        ("numpy.core.multiarray", "scalar"),
        ("numpy._core.multiarray", "scalar"),
    }

    def find_class(self, module, name):
        if (module, name) in self._SAFE:
            return super().find_class(module, name)
        if module.split(".")[0] in ("optax", "numpy"):
            cls = super().find_class(module, name)
            # optax states are NamedTuples; numpy extension dtypes are
            # type objects — both are inert data containers
            if isinstance(cls, type) and issubclass(cls, (tuple, np.dtype)):
                return cls
        raise pickle.UnpicklingError(
            f"checkpoint contains blocked global {module}.{name}")


def load_checkpoint(path: str, train_state=None):
    """Returns a TrainState; auto-detects pickle file vs orbax directory."""
    from cnn_tpu.parallel.train_step import TrainState

    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    else:
        with open(path, "rb") as f:
            payload = _RestrictedUnpickler(f).load()
    to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return TrainState(
        params=to_jnp(payload["params"]),
        state=to_jnp(payload["state"]),
        opt_state=to_jnp(payload["opt_state"]),
        step=jnp.asarray(int(payload["step"]), jnp.int32),
        rng=jax.random.wrap_key_data(jnp.asarray(payload["rng"])),
    )


def tree_has_bn(tree) -> bool:
    """True if the param tree contains a BatchNorm-SHAPED subtree (a dict
    with both 'gamma' and 'beta' leaves — ops/batchnorm.py's param layout).
    Structural, not name-based: lets the train/evaluate CLIs detect whether
    a teacher/ensemble checkpoint was trained with BN without a flag, and
    survives layer renames."""
    if isinstance(tree, dict):
        if "gamma" in tree and "beta" in tree:
            return True
        return any(tree_has_bn(v) for v in tree.values())
    return False


def warm_start(train_state, path: str, optimizer=None):
    """Transfer-learning init: copy into ``train_state`` every params/state
    leaf of the checkpoint at ``path`` whose tree path exists here with an
    identical shape; mismatched leaves (e.g. the classifier head when
    ``num_classes`` differs) keep their fresh init. The optimizer state is
    re-initialized from the merged params (pass ``optimizer``; EMA/momentum
    slots must track the warmed weights, not the discarded fresh init) and
    step/rng stay fresh — this is a NEW run warm-started from old weights,
    not a resume. Returns ``(train_state, copied_paths, skipped_paths)``.

    Superset: the reference has no transfer/fine-tune path — its loader
    requires the identical topology (alexnet.cpp:80-90).
    """
    src = load_checkpoint(path)

    def merge(fresh, loaded, prefix, copied, skipped):
        if isinstance(fresh, dict):
            if not isinstance(loaded, dict):
                skipped.append(f"{prefix} (not a dict in source)")
                return fresh
            out = {}
            for k, v in fresh.items():
                if k in loaded:
                    out[k] = merge(v, loaded[k], f"{prefix}/{k}", copied, skipped)
                else:
                    skipped.append(f"{prefix}/{k} (missing in source)")
                    out[k] = v
            return out
        l_shape = getattr(loaded, "shape", None)
        if l_shape == fresh.shape:
            copied.append(prefix)
            return jnp.asarray(loaded, fresh.dtype)
        skipped.append(f"{prefix} (shape {l_shape} vs {fresh.shape})")
        return fresh

    copied, skipped = [], []
    params = merge(train_state.params, src.params, "", copied, skipped)
    state = merge(train_state.state, src.state, "", copied, skipped)
    if optimizer is not None:
        # seed the EMA'd model state (no-op for non-EMA optimizers) so the
        # opt_state structure is stable before the first jitted-step trace
        from cnn_tpu.optim import ema_seed_model_state
        opt_state = ema_seed_model_state(optimizer.init(params), state)
    else:
        opt_state = train_state.opt_state
    return (train_state._replace(params=params, state=state,
                                 opt_state=opt_state),
            copied, skipped)


def checkpoint_name(iteration: int, train_acc: float, valid_acc: float,
                    suffix: str = ".ckpt") -> str:
    """Reference filename convention (cnn.cpp:121-124)."""
    return f"iter_{iteration}_train_{train_acc:.3f}_valid_{valid_acc:.3f}{suffix}"


def parse_checkpoint_name(name: str):
    m = re.match(r"iter_(\d+)_train_([\d.]+)_valid_([\d.]+)\.", name)
    if not m:
        return None
    return int(m.group(1)), float(m.group(2)), float(m.group(3))


# --------------------------------------------------- reference .model -------


def _param_layers(net: Sequential):
    for layer in net.layers:
        if isinstance(layer, (Conv2D, DepthwiseConv2D, Linear, BatchNorm2D)):
            yield layer


def reference_param_count(net: Sequential, bn_vectors: int = 4) -> int:
    """``bn_vectors=4`` is the current C++ save format (gamma, beta,
    moving_mean, moving_var — batchnorm2d.cpp:168-174); ``bn_vectors=2`` is
    the older gamma/beta-only format that the committed
    ``checkpoints/AlexNet_bn/*.model`` artifacts were written with (they are
    1,920 bytes short of the current format and the reference's own current
    loader can no longer read them)."""
    n = 0
    for layer in _param_layers(net):
        if isinstance(layer, Conv2D):
            n += layer.out_channels * (layer.in_channels * layer.kernel_size ** 2 + 1)
        elif isinstance(layer, DepthwiseConv2D):
            # stored like a conv with in_channels=1 (the grouped filter bank)
            n += layer.out_channels * (layer.kernel_size ** 2 + 1)
        elif isinstance(layer, Linear):
            n += layer.in_features * layer.out_features + layer.out_features
        elif isinstance(layer, BatchNorm2D):
            n += bn_vectors * layer.num_channels
    return n


def import_reference_model(path: str, net: Sequential,
                           feature_hw: int | None = None) -> tuple[dict, dict]:
    """Load a reference ``.model`` file into (params, state) for ``net``.

    ``feature_hw``: spatial extent of the conv features entering the dense
    layer (6 for the 224x224 AlexNet); inferred from the layer stack when
    None.
    """
    raw = np.fromfile(path, dtype="<f4")
    expected = reference_param_count(net)
    legacy = reference_param_count(net, bn_vectors=2)
    legacy_bn = raw.size == legacy != expected
    assert raw.size in (expected, legacy), (
        f"{path}: has {raw.size} f32, model needs {expected} "
        f"(or {legacy} in the legacy 2-vector-BN format)")

    params: dict = {}
    state: dict = {}
    pos = 0

    def take(n):
        nonlocal pos
        out = raw[pos:pos + n]
        pos += n
        return out

    last_conv_channels = None
    for layer in _param_layers(net):
        if isinstance(layer, Conv2D):
            o, i, k = layer.out_channels, layer.in_channels, layer.kernel_size
            w = take(o * i * k * k).reshape(o, i, k, k).transpose(2, 3, 1, 0)
            b = take(o)
            params[layer.name] = {"w": jnp.asarray(w.copy()),
                                  "b": jnp.asarray(b.copy())}
            last_conv_channels = o
        elif isinstance(layer, DepthwiseConv2D):
            o, k = layer.out_channels, layer.kernel_size
            w = take(o * k * k).reshape(o, 1, k, k).transpose(2, 3, 1, 0)
            b = take(o)
            params[layer.name] = {"w": jnp.asarray(w.copy()),
                                  "b": jnp.asarray(b.copy())}
            last_conv_channels = o
        elif isinstance(layer, Linear):
            fin, fout = layer.in_features, layer.out_features
            w = take(fin * fout).reshape(fin, fout)
            b = take(fout)
            c = last_conv_channels
            if c is not None and fin % c == 0:
                hw = feature_hw if feature_hw is not None else int(round((fin // c) ** 0.5))
                assert c * hw * hw == fin, (c, hw, fin)
                # reference in-dim order is (c, h, w); ours is (h, w, c)
                w = w.reshape(c, hw, hw, fout).transpose(1, 2, 0, 3).reshape(fin, fout)
            params[layer.name] = {"w": jnp.asarray(w.copy()),
                                  "b": jnp.asarray(b.copy())}
        elif isinstance(layer, BatchNorm2D):
            n = layer.num_channels
            params[layer.name] = {"gamma": jnp.asarray(take(n).copy()),
                                  "beta": jnp.asarray(take(n).copy())}
            if legacy_bn:
                # the old save format carried no moving stats; identity
                # stats make the weights usable for (approximate) eval
                state[layer.name] = {"mean": jnp.zeros((n,), jnp.float32),
                                     "var": jnp.ones((n,), jnp.float32)}
            else:
                state[layer.name] = {"mean": jnp.asarray(take(n).copy()),
                                     "var": jnp.asarray(take(n).copy())}
    assert pos == raw.size
    return params, state


def export_reference_model(path: str, net: Sequential, params: dict,
                           state: dict, feature_hw: int | None = None) -> None:
    """Write (params, state) as a reference-format ``.model`` file."""
    chunks: list[np.ndarray] = []
    last_conv_channels = None
    for layer in _param_layers(net):
        p = jax.tree_util.tree_map(np.asarray, params[layer.name])
        if isinstance(layer, (Conv2D, DepthwiseConv2D)):
            chunks.append(np.ascontiguousarray(
                p["w"].transpose(3, 2, 0, 1)).ravel())  # HWIO -> OIHW
            chunks.append(p["b"].ravel())
            last_conv_channels = layer.out_channels
        elif isinstance(layer, Linear):
            w = p["w"]
            fin, fout = w.shape
            c = last_conv_channels
            if c is not None and fin % c == 0:
                hw = feature_hw if feature_hw is not None else int(round((fin // c) ** 0.5))
                w = w.reshape(hw, hw, c, fout).transpose(2, 0, 1, 3).reshape(fin, fout)
            chunks.append(np.ascontiguousarray(w).ravel())
            chunks.append(p["b"].ravel())
        elif isinstance(layer, BatchNorm2D):
            s = jax.tree_util.tree_map(np.asarray, state[layer.name])
            chunks.extend([p["gamma"].ravel(), p["beta"].ravel(),
                           s["mean"].ravel(), s["var"].ravel()])
    flat = np.concatenate(chunks).astype("<f4")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat.tofile(path)
