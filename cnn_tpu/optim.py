"""Optimizers.

The reference applies plain SGD inside each layer (``w -= lr * dw``,
``conv2d.cpp:205-217``, ``linear.cpp:95-102``, ``batchnorm2d.cpp:161-166``)
and lists momentum/Adam as unimplemented future work (``cnn.cpp:17``). Here
the optimizer is a separate pure transform; ``sgd`` is bit-faithful to the
reference update, and momentum/Adam come via optax as supersets.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class Optimizer(NamedTuple):
    init: Callable[[Any], Any]
    update: Callable[[Any, Any, Any], tuple[Any, Any]]  # (grads, opt_state, params) -> (params, opt_state)


def sgd(learning_rate: float) -> Optimizer:
    """Plain SGD: ``w -= lr * g`` — the reference's exact update."""
    lr = jnp.float32(learning_rate)

    def init(params):
        return ()

    def update(grads, opt_state, params):
        new_params = jax.tree_util.tree_map(
            lambda p, g: (p - lr * g.astype(p.dtype)).astype(p.dtype), params, grads)
        return new_params, opt_state

    return Optimizer(init, update)


class EmaState(NamedTuple):
    """Wrapper optimizer state: inner optimizer state + the EMA weights.

    ``mstate`` is the matching EMA of the MODEL state (BN moving stats,
    ``parallel.train_step`` feeds it via ``ema_update_state``); ``decay``
    rides along so that update needs no out-of-band config. Both default
    for unpickling pre-round-4 checkpoints; ``ema_seed_model_state``
    materializes the missing ``mstate`` at load/warm-start time (keeping
    the jitted step's carry structure stable)."""
    inner: Any
    ema: Any
    count: jnp.ndarray
    decay: Any = None
    mstate: Any = None


def with_ema(opt: Optimizer, decay: float = 0.999) -> Optimizer:
    """Track an exponential moving average of the weights alongside ``opt``.

    The EMA rides the optimizer state (so it checkpoints, resumes, and
    shards with everything else — its pytree paths contain the layer
    names, giving it the same TP placement as the raw params). Early
    steps use the bias-corrected effective decay
    ``min(decay, (1+t)/(10+t))`` so the average warms up from the actual
    weights instead of the init. Evaluate/serve with
    ``ema_params(opt_state)``; a standard production accuracy lever the
    reference (plain in-layer SGD, conv2d.cpp:205-217) has no analog of.
    """
    d = jnp.float32(decay)

    def init(params):
        # copy=True: astype on f32 params would ALIAS the param buffers,
        # and a donating train step then donates each buffer twice
        return EmaState(inner=opt.init(params),
                        ema=jax.tree_util.tree_map(
                            lambda p: jnp.array(p, jnp.float32, copy=True),
                            params),
                        count=jnp.zeros((), jnp.int32), decay=d)

    def update(grads, opt_state, params):
        new_params, inner = opt.update(grads, opt_state.inner, params)
        count = opt_state.count + 1
        eff = jnp.minimum(d, (1.0 + count) / (10.0 + count))
        ema = jax.tree_util.tree_map(
            lambda e, p: eff * e + (1.0 - eff) * p.astype(jnp.float32),
            opt_state.ema, new_params)
        return new_params, opt_state._replace(inner=inner, ema=ema,
                                              count=count)

    return Optimizer(init, update)


def ema_update_state(opt_state, new_state):
    """EMA the MODEL state alongside the weight EMA (same decay/warmup).

    Evaluating EMA weights against the raw run's BatchNorm moving
    statistics is inconsistent: the EMA weights average the last ~1/(1-d)
    steps' trajectory while the moving stats track the CURRENT weights'
    activation distribution. Measured on pipecnn w256 L8 (8 stacked BN
    residual blocks, lr 1.5e-2 cosine): at iter 3000 the raw weights score
    valid 0.705 / loss 1.31 while the EMA weights scored 0.445 / loss 11.2
    against the raw stats — the mismatch compounds per block. The standard
    production fix (e.g. timm's ModelEmaV2) averages ALL model variables,
    buffers included; ``ema_model_state`` then serves the consistent pair.

    Called by every train step right after ``optimizer.update``; a no-op
    unless ``opt_state`` is an ``EmaState``. Non-float leaves copy through.
    A legacy ``mstate=None`` (pre-round-4 checkpoint resume) initializes
    from the incoming state.
    """
    if not isinstance(opt_state, EmaState):
        return opt_state
    d = (jnp.float32(0.999) if opt_state.decay is None
         else jnp.float32(opt_state.decay))
    # update() already advanced count for this step
    eff = jnp.minimum(d, (1.0 + opt_state.count) / (10.0 + opt_state.count))

    def to_f32(s):
        return jax.tree_util.tree_map(
            lambda x: (jnp.array(x, jnp.float32, copy=True)
                       if jnp.issubdtype(x.dtype, jnp.floating) else x),
            s)

    if opt_state.mstate is None:
        return opt_state._replace(mstate=to_f32(new_state))
    mstate = jax.tree_util.tree_map(
        lambda m, s: (eff * m + (1.0 - eff) * s.astype(jnp.float32)
                      if jnp.issubdtype(s.dtype, jnp.floating) else s),
        opt_state.mstate, new_state)
    return opt_state._replace(mstate=mstate)


def ema_seed_model_state(opt_state, state, decay=None):
    """Materialize a missing ``EmaState.mstate`` from ``state`` (host-side,
    at checkpoint load / warm start) WITHOUT advancing the average when it
    is already present. The jitted train step's opt_state pytree structure
    must be stable before the first trace: a lazy first fill inside a
    steps-per-call ``lax.scan`` would change the carry structure mid-scan
    and fail to trace (data/device_dataset.py:425, parallel/pipeline.py:852).

    ``decay`` backfills a legacy (pre-round-4) state's missing decay field
    from the live run's ``--ema`` flag — also a load-time-only concern:
    filling it inside the jitted step would change the carry structure,
    and without it ``ema_update_state`` falls back to 0.999, averaging the
    BN stats over a different horizon than the weight EMA whenever the run
    used a non-default decay.
    """
    if isinstance(opt_state, EmaState):
        if opt_state.decay is None and decay is not None:
            opt_state = opt_state._replace(decay=jnp.float32(decay))
        if opt_state.mstate is None:
            return ema_update_state(opt_state, state)  # seeds an f32 copy
    return opt_state


def ema_model_state(opt_state, fallback=None):
    """The EMA'd model state (BN moving stats) if present, else
    ``fallback`` — evaluate/serve EMA weights with THIS state, never the
    raw run's (see ``ema_update_state``)."""
    if isinstance(opt_state, EmaState) and opt_state.mstate is not None:
        return opt_state.mstate
    return fallback


def with_frozen(opt: Optimizer, prefixes) -> Optimizer:
    """Freeze every param whose '/'-joined tree path starts with one of
    ``prefixes`` (e.g. ``("stem", "block_1")``) — head-only fine-tuning
    on top of ``warm_start``. Gradients for frozen subtrees are zeroed
    before the inner update AND the frozen leaves are restored after it,
    so stateful transforms (momentum, weight decay's
    ``add_decayed_weights``) can neither drift the weights nor pollute
    their slots. Superset: the reference has no notion of per-layer
    trainability (every layer self-updates in its own backward,
    conv2d.cpp:205-217).
    """
    prefixes = tuple(p.strip() for p in prefixes if p.strip())
    assert prefixes, "with_frozen needs at least one path prefix"

    def frozen_map(fn, tree, *rest, path=""):
        if isinstance(tree, dict):
            return {k: frozen_map(fn, v, *(r[k] for r in rest),
                                  path=f"{path}/{k}" if path else k)
                    for k, v in tree.items()}
        return fn(any(path.startswith(p) for p in prefixes), tree, *rest)

    def init(params):
        n = [0]

        def count(is_frozen, _):
            n[0] += is_frozen
            return _
        frozen_map(count, params)
        assert n[0] > 0, f"--freeze {prefixes} matched no parameters"
        return opt.init(params)

    def update(grads, opt_state, params):
        grads = frozen_map(
            lambda f, g: jnp.zeros_like(g) if f else g, grads)
        new_params, new_state = opt.update(grads, opt_state, params)
        new_params = frozen_map(
            lambda f, new, old: old if f else new, new_params, params)
        return new_params, new_state

    return Optimizer(init, update)


def ema_params(opt_state) -> Any | None:
    """The EMA weights pytree if ``opt_state`` carries one, else None."""
    if isinstance(opt_state, EmaState):
        return opt_state.ema
    return None


def from_optax(tx: optax.GradientTransformation) -> Optimizer:
    def init(params):
        return tx.init(params)

    def update(grads, opt_state, params):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    return Optimizer(init, update)


def make_schedule(learning_rate: float, schedule: str = "constant",
                  total_steps: int = 0, warmup_steps: int = 0):
    """LR schedule factory (the reference has a single constant lr)."""
    if schedule == "constant" and warmup_steps == 0:
        return learning_rate
    if schedule == "constant":
        return optax.linear_schedule(0.0, learning_rate, warmup_steps)
    assert total_steps > 0, f"schedule '{schedule}' needs total_steps"
    if schedule == "cosine":
        if warmup_steps:
            return optax.warmup_cosine_decay_schedule(
                0.0, learning_rate, warmup_steps, total_steps)
        return optax.cosine_decay_schedule(learning_rate, total_steps)
    if schedule == "step":
        # /10 at 60% and 85% of training — the classic staircase
        return optax.piecewise_constant_schedule(
            learning_rate, {int(total_steps * 0.6): 0.1,
                            int(total_steps * 0.85): 0.1})
    raise ValueError(f"unknown schedule '{schedule}'")


def make_optimizer(name: str, learning_rate: float, momentum: float = 0.0,
                   schedule: str = "constant", total_steps: int = 0,
                   warmup_steps: int = 0, weight_decay: float = 0.0,
                   grad_clip: float = 0.0) -> Optimizer:
    """``grad_clip > 0`` clips the GLOBAL gradient norm to that value
    before the update (optax.clip_by_global_norm) — the standard
    spike-robustness guard for long production runs."""
    lr = make_schedule(learning_rate, schedule, total_steps, warmup_steps)

    def clipped(tx: optax.GradientTransformation) -> Optimizer:
        if grad_clip > 0.0:
            tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
        return from_optax(tx)

    # one resolution for every branch: 'momentum' defaults to 0.9 whether
    # or not weight decay / clipping are present (adding --weight-decay
    # must not silently change the optimizer family)
    mom = momentum or (0.9 if name == "momentum" else 0.0)

    if weight_decay > 0.0:
        if name == "adam":
            return clipped(optax.adamw(lr, weight_decay=weight_decay))
        tx = optax.chain(optax.add_decayed_weights(weight_decay),
                         optax.sgd(lr, momentum=mom or None))
        return clipped(tx)
    if name == "sgd" and mom == 0.0 and isinstance(lr, float) \
            and grad_clip == 0.0:
        return sgd(lr)
    if name in ("sgd", "momentum"):
        return clipped(optax.sgd(lr, momentum=mom or None))
    if name == "adam":
        return clipped(optax.adam(lr))
    raise ValueError(f"unknown optimizer '{name}'")
