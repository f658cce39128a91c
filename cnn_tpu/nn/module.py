"""Functional layer specs.

The reference's ``Layer`` base (``architectures.h:34-46``) is a mutable OO
interface: ``forward`` caches inputs/outputs in the object, ``backward``
consumes them, ``update_gradients`` applies SGD in-layer, and a global
``no_grad`` flag switches behavior. The TPU-native design inverts all of
that: a layer is an immutable *spec* whose ``init`` returns pytrees and whose
``apply`` is a pure function ``(params, state, x, train, rng) -> (y, state)``.
Gradients come from ``jax.grad`` over the composed function; the optimizer is
a separate transform (``cnn_tpu/optim.py``); train/eval is an argument.

Each layer exposes ``has_params`` / ``has_state`` so Sequential can build
minimal pytrees, and ``param_spec`` metadata used by the reference ``.model``
checkpoint importer/exporter (``cnn_tpu/utils/checkpoint.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp

from cnn_tpu import ops


@dataclass(frozen=True)
class Layer:
    name: str

    has_params: bool = field(default=False, init=False, repr=False)
    has_state: bool = field(default=False, init=False, repr=False)
    needs_rng: bool = field(default=False, init=False, repr=False)

    def init(self, key: Optional[jax.Array], dtype=jnp.float32) -> tuple[Any, Any]:
        return None, None

    def apply(self, params: Any, state: Any, x: jnp.ndarray, *,
              train: bool, rng: Optional[jax.Array] = None,
              compute_dtype=None) -> tuple[jnp.ndarray, Any]:
        raise NotImplementedError

    def out_shape(self, in_shape: tuple[int, ...]) -> tuple[int, ...]:
        """Spatial shape inference for (H, W, C) tuples."""
        return in_shape

    def param_pspecs(self, model_dim: int) -> Optional[dict]:
        """Tensor-parallel PartitionSpec per param key, or None to replicate.

        Sharding intent lives on the layer spec (each layer knows which of
        its axes can split over the mesh's 'model' axis), so the sharder in
        ``cnn_tpu/parallel/train_step.py`` never guesses from layer names.
        """
        return None


@dataclass(frozen=True)
class Conv2D(Layer):
    """NHWC/HWIO conv (reference: ``Conv2D``, conv2d.cpp; padding=0 there)."""
    in_channels: int = 3
    out_channels: int = 16
    kernel_size: int = 3
    stride: int = 2
    padding: int = 0
    init_scale: float = 0.1   # N(0,1) * scale, the reference's init
    # run as space-to-depth + stride-1 conv (exact repack, stride 2 only):
    # 4x the MXU input lanes for small-cin convs; params keep the
    # reference [k,k,cin,cout] layout so checkpoints are unaffected
    s2d: bool = False

    def __post_init__(self):
        object.__setattr__(self, "has_params", True)
        assert not (self.s2d and self.stride != 2), \
            "s2d execution is the stride-2 specialization"

    def init(self, key, dtype=jnp.float32):
        return ops.conv2d_init(key, self.in_channels, self.out_channels,
                               self.kernel_size, dtype,
                               init_scale=self.init_scale), None

    def apply(self, params, state, x, *, train, rng=None, compute_dtype=None):
        if self.s2d:
            return ops.conv2d_s2d(params, x, self.stride, compute_dtype,
                                  padding=self.padding), state
        return ops.conv2d(params, x, self.stride, compute_dtype,
                          padding=self.padding), state

    def out_shape(self, in_shape):
        h, w, _ = in_shape
        return (ops.conv_out_size(h, self.kernel_size, self.stride, self.padding),
                ops.conv_out_size(w, self.kernel_size, self.stride, self.padding),
                self.out_channels)

    def param_pspecs(self, model_dim):
        # shard out-channels of wide convs over 'model' (tiny convs would
        # leave the MXU starved per shard — replicate those)
        if model_dim > 1 and self.out_channels % model_dim == 0 \
                and self.out_channels >= 32 * model_dim:
            from jax.sharding import PartitionSpec as P
            return {"w": P(None, None, None, "model")}
        return None


@dataclass(frozen=True)
class DepthwiseConv2D(Layer):
    """Per-channel conv (``feature_group_count=C``) — the depthwise half of a
    separable conv. A framework superset: the reference's Conv2D is always
    dense over its input channels (conv2d.cpp:69-92)."""
    channels: int = 32
    channel_multiplier: int = 1
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    init_scale: float = 0.1

    def __post_init__(self):
        object.__setattr__(self, "has_params", True)

    @property
    def out_channels(self) -> int:
        return self.channels * self.channel_multiplier

    def init(self, key, dtype=jnp.float32):
        return ops.depthwise_conv2d_init(
            key, self.channels, self.channel_multiplier, self.kernel_size,
            dtype, init_scale=self.init_scale), None

    def apply(self, params, state, x, *, train, rng=None, compute_dtype=None):
        return ops.depthwise_conv2d(
            params, x, self.stride, compute_dtype, padding=self.padding,
            channel_multiplier=self.channel_multiplier), state

    def out_shape(self, in_shape):
        h, w, _ = in_shape
        return (ops.conv_out_size(h, self.kernel_size, self.stride, self.padding),
                ops.conv_out_size(w, self.kernel_size, self.stride, self.padding),
                self.out_channels)

    # no param_pspecs: sharding a grouped conv's channel axis over 'model'
    # splits input AND output channels together; GSPMD handles it, but the
    # per-shard work is tiny (VPU-bound already) — replicate.


@dataclass(frozen=True)
class MaxPool2D(Layer):
    """kernel/stride max pool (reference: ``MaxPool2D``, pool2d.cpp)."""
    kernel_size: int = 2
    stride: int = 2

    def apply(self, params, state, x, *, train, rng=None, compute_dtype=None):
        return ops.max_pool2d(x, self.kernel_size, self.stride), state

    def out_shape(self, in_shape):
        h, w, c = in_shape
        return (ops.conv_out_size(h, self.kernel_size, self.stride),
                ops.conv_out_size(w, self.kernel_size, self.stride), c)


@dataclass(frozen=True)
class AvgPool2D(Layer):
    """Average pooling — the reference's TODO #7 (cnn.cpp:21)."""
    kernel_size: int = 2
    stride: int = 2

    def apply(self, params, state, x, *, train, rng=None, compute_dtype=None):
        return ops.avg_pool2d(x, self.kernel_size, self.stride), state

    def out_shape(self, in_shape):
        h, w, c = in_shape
        return (ops.conv_out_size(h, self.kernel_size, self.stride),
                ops.conv_out_size(w, self.kernel_size, self.stride), c)


@dataclass(frozen=True)
class GlobalAvgPool(Layer):
    """Global spatial mean — the reference's TODO #7 'Global Pool'."""

    def apply(self, params, state, x, *, train, rng=None, compute_dtype=None):
        return ops.global_avg_pool(x), state

    def out_shape(self, in_shape):
        return (in_shape[-1],)


@dataclass(frozen=True)
class ReLU(Layer):
    def apply(self, params, state, x, *, train, rng=None, compute_dtype=None):
        return ops.relu(x), state


@dataclass(frozen=True)
class Flatten(Layer):
    """[B,H,W,C] -> [B, H*W*C]. Implicit in the reference's LinearLayer."""
    def apply(self, params, state, x, *, train, rng=None, compute_dtype=None):
        return x.reshape(x.shape[0], -1), state

    def out_shape(self, in_shape):
        n = 1
        for d in in_shape:
            n *= d
        return (n,)


@dataclass(frozen=True)
class Linear(Layer):
    """Dense (reference: ``LinearLayer``, linear.cpp)."""
    in_features: int = 4608
    out_features: int = 3

    def __post_init__(self):
        object.__setattr__(self, "has_params", True)

    def init(self, key, dtype=jnp.float32):
        return ops.linear_init(key, self.in_features, self.out_features, dtype), None

    def apply(self, params, state, x, *, train, rng=None, compute_dtype=None):
        return ops.linear(params, x, compute_dtype), state

    def out_shape(self, in_shape):
        return (self.out_features,)

    def param_pspecs(self, model_dim):
        # shard in-features over 'model': the head matmul becomes a partial
        # contraction GSPMD finishes with a psum over ICI
        if model_dim > 1 and self.in_features % model_dim == 0:
            from jax.sharding import PartitionSpec as P
            return {"w": P("model", None)}
        return None


@dataclass(frozen=True)
class BatchNorm2D(Layer):
    """Per-channel BN (reference: ``BatchNorm2D``, batchnorm2d.cpp)."""
    num_channels: int = 16
    eps: float = 1e-5
    momentum: float = 0.1
    compat_zero_var_init: bool = False  # reproduce the reference's broken eval

    def __post_init__(self):
        object.__setattr__(self, "has_params", True)
        object.__setattr__(self, "has_state", True)

    def init(self, key, dtype=jnp.float32):
        return ops.batch_norm2d_init(self.num_channels, dtype,
                                     self.compat_zero_var_init)

    def apply(self, params, state, x, *, train, rng=None, compute_dtype=None):
        return ops.batch_norm2d(params, state, x, train=train,
                                eps=self.eps, momentum=self.momentum)


@dataclass(frozen=True)
class ResidualBlock(Layer):
    """Residual block: ``relu(body(x) + shortcut(x))``.

    The reference's TODO #5 ("网络结构有点差劲", cnn.cpp:21) asks for better
    architectures; residual composition is the standard answer and needs a
    composite layer the reference's flat list cannot express. ``body`` is
    any Sequential; the shortcut is identity, or a 1x1 strided projection
    conv when the spatial/channel shape changes. Params/state nest under
    this block's name as {"body": ..., "proj": ...}.
    """
    body: Any = None
    proj: Optional[Any] = None    # Conv2D spec for the projection shortcut

    def __post_init__(self):
        object.__setattr__(self, "has_params", True)
        object.__setattr__(self, "has_state",
                           any(l.has_state for l in self.body.layers))
        object.__setattr__(self, "needs_rng",
                           any(l.needs_rng for l in self.body.layers))

    def init(self, key, dtype=jnp.float32):
        k_body, k_proj = jax.random.split(key)
        p_body, s_body = self.body.init(k_body, dtype)
        params = {"body": p_body}
        state = {"body": s_body} if self.has_state else None
        if self.proj is not None:
            p_proj, _ = self.proj.init(k_proj, dtype)
            params["proj"] = p_proj
        return params, state

    @staticmethod
    def combine(y, shortcut):
        """The residual merge — the single definition other views of this
        block (e.g. the quantized trunk, cnn_tpu/quant.py) must share."""
        return ops.relu(y + shortcut)

    def apply(self, params, state, x, *, train, rng=None, compute_dtype=None):
        body_state = (state or {}).get("body", {})
        y, new_body_state, _ = self.body.apply(
            params["body"], body_state, x, train=train, rng=rng,
            compute_dtype=compute_dtype)
        if self.proj is not None:
            sc, _ = self.proj.apply(params["proj"], None, x, train=train,
                                    compute_dtype=compute_dtype)
        else:
            sc = x
        out = self.combine(y, sc)
        return out, ({"body": new_body_state} if self.has_state else state)

    def out_shape(self, in_shape):
        shape = in_shape
        for l in self.body.layers:
            shape = l.out_shape(shape)
        return shape


@dataclass(frozen=True)
class Dropout(Layer):
    """Channel dropout (reference: ``Dropout``, dropout.cpp)."""
    p: float = 0.5
    compat: str = "inverted"  # 'reference' | 'sampled' | 'inverted'

    def __post_init__(self):
        object.__setattr__(self, "needs_rng", self.compat != "reference")

    def apply(self, params, state, x, *, train, rng=None, compute_dtype=None):
        return ops.channel_dropout(x, self.p, train=train, rng=rng,
                                   compat=self.compat), state


@dataclass(frozen=True)
class StackedBlocks(Layer):
    """``n_blocks`` structurally identical blocks, scanned (scan-over-layers).

    Params/state of every block are stacked with a leading ``[L]`` axis and
    the stack is applied with ``lax.scan``, so XLA traces and compiles the
    block body ONCE regardless of depth — the TPU-idiomatic way to express
    deep repeated trunks (constant compile time, constant HLO size).

    The leading ``[L]`` axis is also the pipeline-parallel shard axis:
    ``cnn_tpu/parallel/pipeline.py`` splits it over a 'stage' mesh axis and
    runs the blocks as a GPipe microbatch pipeline, each stage owning
    ``L // n_stages`` consecutive blocks. (The reference has no equivalent —
    its model is a flat ``std::list`` of distinct layers, alexnet.cpp:10-33;
    this layer exists for the depth/scale the reference's TODO #5 asks for.)

    The block must be shape-preserving (``out_shape(s) == s``).

    ``remat=True`` (or ``'full'``) wraps the scanned body in
    ``jax.checkpoint``: the backward pass recomputes each block's internals
    instead of saving L stacks of residuals — activation memory drops from
    O(L * ops-per-block) to O(L) carries, the standard scan-over-layers +
    remat idiom that lets batch/depth scale to the HBM limit.

    ``remat='conv'`` is the selective policy: conv outputs (tagged
    ``'conv_out'`` in ops/conv.py) are SAVED, so the backward never re-runs
    the MXU-bound convs — it recomputes only the cheap VPU elementwise tail
    (BN/ReLU/bias). Costs ~2 saved activations per block instead of ~6,
    with none of full remat's 25% matmul-FLOP overhead; measured fastest on
    the deep trunk (tools/bench_deep_mfu.py, BASELINE.md §r3).
    """
    block: Any = None
    n_blocks: int = 1
    remat: Any = False  # False | True | 'full' | 'conv'

    def __post_init__(self):
        object.__setattr__(self, "has_params", True)
        object.__setattr__(self, "has_state", self.block.has_state)
        object.__setattr__(self, "needs_rng", self.block.needs_rng)

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, self.n_blocks)
        inits = [self.block.init(k, dtype) for k in keys]
        params = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[p for p, _ in inits])
        state = None
        if self.has_state:
            state = jax.tree.map(lambda *xs: jnp.stack(xs),
                                 *[s for _, s in inits])
        return params, state

    def apply(self, params, state, x, *, train, rng=None, compute_dtype=None):
        xs = {"p": params}
        if self.has_state:
            xs["s"] = state
        if self.needs_rng and rng is not None:
            xs["k"] = jax.random.split(rng, self.n_blocks)

        def body(h, inp):
            y, new_s = self.block.apply(
                inp["p"], inp.get("s"), h, train=train, rng=inp.get("k"),
                compute_dtype=compute_dtype)
            return y, new_s if self.has_state else None

        if self.remat == "conv":
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_out", "bn_stats"))
        elif self.remat:
            body = jax.checkpoint(body)
        y, new_state = jax.lax.scan(body, x, xs)
        return y, (new_state if self.has_state else state)

    def out_shape(self, in_shape):
        shape = self.block.out_shape(in_shape)
        assert shape == in_shape, (
            f"StackedBlocks needs a shape-preserving block: {in_shape} -> {shape}")
        return shape
