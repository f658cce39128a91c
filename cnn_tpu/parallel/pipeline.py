"""Pipeline parallelism: GPipe microbatch schedule over a 'stage' mesh axis.

The reference is a single-threaded loop with zero parallelism (SURVEY.md §2);
DP and TP are introduced in ``train_step.py`` via GSPMD sharding constraints.
This module adds the third axis of the standard TPU scaling toolbox:
**pipeline parallelism** over ICI, written in the explicit ``shard_map`` +
``lax.ppermute`` style (the scaling-book recipe) rather than GSPMD, because
the pipeline schedule — who computes which microbatch when — is exactly the
thing the programmer must own.

Model contract: the model's ``net`` contains exactly one
``nn.StackedBlocks`` trunk (L structurally identical, shape-preserving
blocks with params stacked on a leading ``[L]`` axis). The stage axis
splits that leading axis: each of the S stages owns ``L // S`` consecutive
blocks. Layers before the trunk (the stem) and after it (the head) are
small; they run replicated on every stage and only stage 0 / stage S-1's
results are live — their gradients are psum-reduced so every device leaves
the step with identical replicated values.

Schedule: classic GPipe. The batch splits into M microbatches; time runs
for ``T = M + S - 1`` ticks; at tick ``t`` stage ``s`` processes microbatch
``t - s`` (bubble ticks compute masked garbage). Activations hop one stage
per tick via ``lax.ppermute`` — a nearest-neighbor ICI transfer, the
cheapest collective on a TPU torus. Differentiating straight through the
scan-of-ppermutes gives the reverse pipeline for free: cotangents hop
backwards stage to stage, and each stage's parameter gradients are computed
exactly where its parameters live (no gradient gather/scatter traffic).

BatchNorm caveat (standard GPipe semantics): with M > 1 microbatches, BN
batch statistics are per-microbatch, not per-batch; moving stats updated on
bubble ticks are masked out. With M = 1 the math is bit-identical to the
unpipelined model (tested in tests/test_pipeline.py).

Composes with data parallelism: pass a mesh with ('data', 'stage') axes and
the batch shards over 'data' while the trunk depth shards over 'stage';
gradients are pmean'd over 'data' and psum'd over 'stage' explicitly.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cnn_tpu.nn.module import StackedBlocks
from cnn_tpu.nn.sequential import Sequential
from cnn_tpu.ops.losses import softmax_cross_entropy
from cnn_tpu.optim import Optimizer
from cnn_tpu.parallel.train_step import TrainState, _prep


def pp_decompose(model) -> tuple[Sequential, StackedBlocks, Sequential]:
    """Split ``model.net`` into (stem, trunk, head) at its StackedBlocks."""
    layers = list(model.net.layers)
    idx = [i for i, l in enumerate(layers) if isinstance(l, StackedBlocks)]
    if len(idx) != 1:
        raise ValueError(
            f"pipeline parallelism needs exactly one StackedBlocks trunk, "
            f"found {len(idx)} in {[l.name for l in layers]}")
    i = idx[0]
    trunk = layers[i]
    if trunk.block.needs_rng:
        raise ValueError("pipelined trunk blocks must not consume rng "
                         "(per-tick rng would differ between the pipelined "
                         "and sequential schedules)")
    head = layers[i + 1:]
    if any(l.has_state for l in head):
        raise ValueError("layers after the pipelined trunk must be "
                         "stateless (their state is only computed validly "
                         "on the last stage)")
    return Sequential(layers[:i]), trunk, Sequential(head)


def _gpipe_trunk(trunk: StackedBlocks, params_s, state_s, h, *,
                 n_stages: int, n_microbatches: int, train: bool,
                 compute_dtype=None, axis: str = "stage"):
    """Per-device GPipe loop (call inside shard_map over ``axis``).

    ``params_s``/``state_s``: this stage's slice, leaves ``[L/S, ...]``.
    ``h``: the full local batch ``[B, ...]`` entering the trunk.
    Returns (trunk output ``[B, ...]`` — valid on the LAST stage only —
    and this stage's updated state slice).
    """
    S, M = n_stages, n_microbatches
    B = h.shape[0]
    assert B % M == 0, f"batch {B} must divide into {M} microbatches"
    x_mb = h.reshape(M, B // M, *h.shape[1:])
    s = lax.axis_index(axis)
    block, has_state = trunk.block, trunk.has_state

    def stage_apply(st, act):
        xs = {"p": params_s}
        if has_state:
            xs["s"] = st

        def body(hh, inp):
            y, new_s = block.apply(inp["p"], inp.get("s"), hh, train=train,
                                   compute_dtype=compute_dtype)
            return y, (new_s if has_state else None)

        if trunk.remat:  # same memory/recompute trade as the scanned trunk
            body = jax.checkpoint(body)
        y, new_st = lax.scan(body, act, xs)
        return y, (new_st if has_state else st)

    zero_act = jnp.zeros_like(x_mb[0])
    outs0 = jnp.zeros_like(x_mb)
    perm = [(i, (i + 1) % S) for i in range(S)]

    def tick(carry, t):
        act, outs, st = carry
        feed = x_mb[jnp.clip(t, 0, M - 1)]
        inp = jnp.where(s == 0, feed, act)
        y, new_st = stage_apply(st, inp)
        if has_state:
            # bubble ticks process garbage: keep their stat updates out
            valid = jnp.logical_and(t - s >= 0, t - s < M)
            st = jax.tree.map(lambda n, o: jnp.where(valid, n, o), new_st, st)
        oidx = jnp.clip(t - (S - 1), 0, M - 1)
        collect = jnp.logical_and(s == S - 1, t - (S - 1) >= 0)
        outs = outs.at[oidx].set(jnp.where(collect, y, outs[oidx]))
        nxt = lax.ppermute(y, axis, perm)
        return (nxt, outs, st), None

    (_, outs, new_state), _ = lax.scan(
        tick, (zero_act, outs0, state_s), jnp.arange(M + S - 1))
    return outs.reshape(B, *h.shape[1:]), new_state


def _specs(model, mesh: Mesh, trunk_name: str):
    """(param/state in-out spec trees, batch spec) for shard_map."""
    data = "data" if "data" in mesh.axis_names else None
    pspec = {l.name: (P("stage") if l.name == trunk_name else P())
             for l in model.net.layers if l.has_params}
    sspec = {l.name: (P("stage") if l.name == trunk_name else P())
             for l in model.net.layers if l.has_state}
    return pspec, sspec, P(data)


def make_pp_train_step(model, optimizer: Optimizer, mesh: Mesh, *,
                       n_microbatches: int, compute_dtype=None,
                       label_smoothing: float = 0.0, donate: bool = True):
    """Jitted pipeline-parallel ``(ts, images, labels) -> (ts, metrics)``.

    The mesh must have a 'stage' axis (trunk depth) and may have a 'data'
    axis (batch). Forward+backward run inside one shard_map over the whole
    mesh with explicit collectives; the optimizer update runs outside under
    GSPMD with the same placements (trunk params/opt state sharded on
    'stage', everything else replicated).
    """
    stem, trunk, head = pp_decompose(model)
    S = mesh.shape["stage"]
    assert trunk.n_blocks % S == 0, \
        f"{trunk.n_blocks} blocks must divide over {S} stages"
    pspec, sspec, bspec = _specs(model, mesh, trunk.name)
    data_axis = "data" if "data" in mesh.axis_names else None
    stem_state_names = [l.name for l in stem.layers if l.has_state]

    def device_fn(params, state, images, labels, rng):
        s = lax.axis_index("stage")
        last = S - 1

        def loss_fn(params):
            h, stem_state, _ = stem.apply(params, state, images, train=True,
                                          rng=rng, compute_dtype=compute_dtype)
            out, trunk_state = _gpipe_trunk(
                trunk, params[trunk.name], state.get(trunk.name), h,
                n_stages=S, n_microbatches=n_microbatches, train=True,
                compute_dtype=compute_dtype)
            logits, _, _ = head.apply(params, {}, out, train=True,
                                      compute_dtype=compute_dtype)
            logits = logits.astype(jnp.float32)
            # the pipeline output is only live on the last stage; stages
            # 0..S-2 contribute zero so the psum of local losses IS the loss
            loss = jnp.where(s == last,
                             softmax_cross_entropy(logits, labels,
                                                   label_smoothing), 0.0)
            correct = jnp.where(s == last, jnp.sum(
                (jnp.argmax(logits, axis=-1) == labels).astype(jnp.int32)), 0)
            return loss, (trunk_state, stem_state, correct)

        (loss, (trunk_state, stem_state, correct)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)

        def reduce_grad(name, g):
            g = g if name == trunk.name else lax.psum(g, "stage")
            return lax.pmean(g, data_axis) if data_axis else g
        grads = {n: jax.tree.map(partial(reduce_grad, n), g)
                 for n, g in grads.items()}
        loss = lax.psum(loss, "stage")
        correct = lax.psum(correct, "stage")
        if data_axis:
            loss = lax.pmean(loss, data_axis)
            correct = lax.psum(correct, data_axis)
        new_state = {n: stem_state[n] for n in stem_state_names}
        if trunk.has_state:
            new_state[trunk.name] = trunk_state
        if data_axis:  # sync-BN style: average moving stats over data shards
            new_state = jax.tree.map(lambda a: lax.pmean(a, data_axis),
                                     new_state)
        return grads, new_state, loss, correct

    spmd = jax.shard_map(device_fn, mesh=mesh,
                         in_specs=(pspec, sspec, bspec, bspec, P()),
                         out_specs=(pspec, sspec, P(), P()),
                         check_vma=False)

    def step(ts: TrainState, images, labels):
        images = _prep(images, compute_dtype)
        rng = jax.random.fold_in(ts.rng, ts.step)
        grads, new_state, loss, correct = spmd(
            ts.params, ts.state, images, labels, rng)
        new_params, new_opt = optimizer.update(grads, ts.opt_state, ts.params)
        new_ts = TrainState(new_params, new_state, new_opt, ts.step + 1,
                            ts.rng)
        return new_ts, {"loss": loss, "correct": correct}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_pp_eval_step(model, mesh: Mesh, *, n_microbatches: int = 1,
                      compute_dtype=None):
    """Jitted pipeline-parallel eval: ``(params, state, images, labels) ->
    {loss, correct, pred}`` (train=False, moving BN stats).

    Ragged batches are fine: the batch is zero-padded up to the shard_map
    divisibility requirement (data_dim * M) inside the step, the forward
    returns gathered logits, and metrics are computed outside shard_map on
    the unpadded slice — matching the GSPMD eval path's semantics.
    """
    stem, trunk, head = pp_decompose(model)
    S = mesh.shape["stage"]
    pspec, sspec, bspec = _specs(model, mesh, trunk.name)
    data_axis = "data" if "data" in mesh.axis_names else None
    data_dim = mesh.shape.get("data", 1)

    def device_fn(params, state, images):
        s = lax.axis_index("stage")
        h, _, _ = stem.apply(params, state, images, train=False,
                             compute_dtype=compute_dtype)
        out, _ = _gpipe_trunk(
            trunk, params[trunk.name], state.get(trunk.name), h,
            n_stages=S, n_microbatches=n_microbatches, train=False,
            compute_dtype=compute_dtype)
        logits, _, _ = head.apply(params, {}, out, train=False,
                                  compute_dtype=compute_dtype)
        logits = jnp.where(s == S - 1, logits.astype(jnp.float32), 0.0)
        logits = lax.psum(logits, "stage")   # broadcast from the last stage
        if data_axis:
            logits = lax.all_gather(logits, data_axis, axis=0, tiled=True)
        return logits

    spmd = jax.shard_map(device_fn, mesh=mesh,
                         in_specs=(pspec, sspec, bspec),
                         out_specs=P(), check_vma=False)

    @jax.jit
    def step(params, state, images, labels):
        images = _prep(images, compute_dtype)
        b = images.shape[0]
        pad = (-b) % (data_dim * n_microbatches)
        if pad:
            images = jnp.concatenate(
                [images, jnp.zeros((pad, *images.shape[1:]), images.dtype)])
        logits = spmd(params, state, images)[:b]
        log_p = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(log_p, labels[..., None], axis=-1)[..., 0]
        pred = jnp.argmax(logits, axis=-1)
        return {"loss": jnp.mean(nll),
                "correct": jnp.sum((pred == labels).astype(jnp.int32)),
                "pred": pred}

    return step


def shard_pp_train_state(ts: TrainState, mesh: Mesh, model) -> TrainState:
    """Place a TrainState for pipeline parallelism: every leaf whose pytree
    path passes through the trunk's name shards its leading ``[L]`` axis over
    'stage'; everything else replicates. Optimizer buffers mirror their
    parameter's placement (their paths contain the same layer name)."""
    _, trunk, _ = pp_decompose(model)
    replicated = NamedSharding(mesh, P())
    staged = NamedSharding(mesh, P("stage"))

    def place(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        sh = staged if trunk.name in names else replicated
        return jax.device_put(leaf, sh)

    def tree_place(tree):
        return jax.tree_util.tree_map_with_path(place, tree)

    return TrainState(params=tree_place(ts.params), state=tree_place(ts.state),
                      opt_state=tree_place(ts.opt_state),
                      step=jax.device_put(ts.step, replicated),
                      rng=jax.device_put(ts.rng, replicated))
