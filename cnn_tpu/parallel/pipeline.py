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

Two schedules:

- ``'gpipe'`` (default): the batch splits into M microbatches; time runs
  for ``T = M + S - 1`` ticks; at tick ``t`` stage ``s`` processes
  microbatch ``t - s`` (bubble ticks compute masked garbage). Activations
  hop one stage per tick via ``lax.ppermute`` — a nearest-neighbor ICI
  transfer, the cheapest collective on a TPU torus. Differentiating
  straight through the scan-of-ppermutes gives the reverse pipeline for
  free: cotangents hop backwards stage to stage, and each stage's
  parameter gradients are computed exactly where its parameters live (no
  gradient gather/scatter traffic). Memory: autodiff saves every tick's
  residuals — live activations grow O(M).
- ``'1f1b'``: memory-bounded pipelining — the backward is hand-scheduled
  as the classic warmup/steady/drain 1F1B (three static-length scans;
  each steady iteration runs one forward and one deferred,
  recompute-based backward sub-slot), so live activations are a ring
  buffer of ``2S - 1`` stage inputs, O(S) and INDEPENDENT of M, and the
  bubble is the classic ``2(S-1)`` chunk-applies per stage. Same math
  (tests assert equality to GPipe); the recompute costs the
  ``remat=True`` FLOP trade. Schedule + live-set arithmetic in
  ``_make_1f1b_device_fn``'s docstring.

BatchNorm caveat (standard GPipe semantics): with M > 1 microbatches, BN
batch statistics are per-microbatch, not per-batch; moving stats updated on
bubble ticks are masked out. With M = 1 the math is bit-identical to the
unpipelined model (tested in tests/test_pipeline.py).

Composes with data parallelism: pass a mesh with ('data', 'stage') axes and
the batch shards over 'data' while the trunk depth shards over 'stage';
gradients are pmean'd over 'data' and psum'd over 'stage' explicitly.
(With DP the shard_map computes per-data-shard BN batch statistics — the
GSPMD path computes global-batch stats; moving stats are pmean-synced.)

Composes with tensor parallelism too (3-axis ('data', 'stage', 'model')
mesh): each trunk block's conv pair runs Megatron-style — the first conv
column-parallel (out-channels over 'model'), the second row-parallel
(in-channels over 'model', partial sums reduced by an explicit psum whose
backward is the identity, ``_psum_id_bwd``); BN/ReLU/Dropout between the
pair run on the sharded channels, everything after the psum replicated.

Rng-consuming blocks (Dropout) pipeline too: per-block keys are the same
``split(fold_in(rng, trunk_index), L)`` the sequential scan draws, sliced
per stage — M=1 is bitwise-equal and M>1 shares each block's per-batch
channel mask across microbatches, exactly the sequential semantics.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cnn_tpu.nn.module import BatchNorm2D, Conv2D, StackedBlocks
from cnn_tpu.nn.sequential import Sequential
from cnn_tpu.ops.losses import softmax_cross_entropy
from cnn_tpu.optim import Optimizer, ema_update_state
from cnn_tpu.parallel.train_step import TrainState, _prep


# ---------------------------------------------------------------------------
# Tensor parallelism inside the pipelined trunk (DP x PP x TP, 3-axis mesh)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _psum_id_bwd(x, axis):
    """psum whose backward is the identity.

    Forward: ``y = psum_s(h_s)`` over the 'model' axis (each shard holds a
    partial sum over its input-channel slice). Backward: ``dL/dh_s = dL/dy``
    because every partial contributes to y with coefficient 1 and the
    cotangent arriving here is already replicated over the axis. Making the
    rule explicit (instead of relying on shard_map's psum transpose under
    check_vma=False) keeps the TP gradient provably correct.
    """
    return lax.psum(x, axis)


def _psum_id_fwd(x, axis):
    return lax.psum(x, axis), None


def _psum_id_rev(axis, _, ct):
    return (ct,)


_psum_id_bwd.defvjp(_psum_id_fwd, _psum_id_rev)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _id_psum_bwd(x, axis):
    """Identity whose backward is a psum — Megatron's 'f' operator.

    Placed on the column conv's INPUT: forward is the identity (x is
    replicated over 'model'), but the cotangent each shard computes through
    its out-channel slice of the column conv is only a PARTIAL of dL/dx —
    the true gradient is the sum over shards. Without this, every layer
    upstream of a TP block (earlier trunk blocks, the stem) trains on
    per-shard partial gradients that silently diverge across 'model'.
    """
    return x


def _id_psum_fwd(x, axis):
    return x, None


def _id_psum_rev(axis, _, ct):
    return (lax.psum(ct, axis),)


_id_psum_bwd.defvjp(_id_psum_fwd, _id_psum_rev)


def tp_split_block(block) -> tuple[Conv2D, Conv2D]:
    """Validate a trunk block for Megatron-style tensor parallelism and
    return its (column, row) conv pair.

    Contract: a projection-free ResidualBlock whose body holds exactly two
    convs — the first is column-parallel (out-channels shard over 'model'),
    the second row-parallel (in-channels shard; partial sums psum'd).
    Layers between them (BN/ReLU/Dropout) run on the sharded channels;
    layers after the row conv run replicated. This covers the pipecnn
    trunk shape; other shapes raise rather than silently mis-shard.
    """
    if block.proj is not None:
        raise ValueError("TP trunk blocks must be projection-free")
    convs = [l for l in block.body.layers if isinstance(l, Conv2D)]
    if len(convs) != 2:
        raise ValueError(
            f"TP needs exactly two convs per block (column+row pair), "
            f"found {[c.name for c in convs]}")
    return convs[0], convs[1]


def _tp_body_apply(block, params, state, x, *, train, rng, compute_dtype,
                   tp_axis: str):
    """Apply a ResidualBlock body under tensor parallelism (call inside
    shard_map; params/state leaves already hold this shard's channel
    slices). Returns (block output, new body state) — output replicated
    over ``tp_axis``."""
    col, row = tp_split_block(block)
    body = block.body.layers
    h, new_state = x, {}
    after_row = False
    for i, l in enumerate(body):
        layer_rng = None
        if l.needs_rng and rng is not None:
            # NOTE: channel ops between the conv pair see LOCAL channels;
            # a dropout mask drawn here covers this shard's slice (same
            # marginal semantics, different pattern than unsharded)
            layer_rng = jax.random.fold_in(
                jax.random.fold_in(rng, i),
                lax.axis_index(tp_axis) if not after_row else 0)
        if l is row:
            # row-parallel: partial sums over the sharded input channels;
            # keep the (replicated) bias OUT of the psum so its gradient
            # never crosses the reduction
            from cnn_tpu import ops
            p = params[l.name]
            y = ops.conv2d({"w": p["w"], "b": jnp.zeros_like(p["b"])}, h,
                           l.stride, compute_dtype, padding=l.padding)
            h = _psum_id_bwd(y, tp_axis) + p["b"].astype(y.dtype)
            after_row = True
            continue
        if l is col:
            # Megatron 'f': identity fwd / psum bwd on the column conv's
            # input — each shard's dL/dh through its out-channel slice is
            # a partial; the residual path (x below) stays outside so its
            # already-replicated cotangent is not multiplied by the axis
            # size
            h = _id_psum_bwd(h, tp_axis)
        h, s = l.apply(params.get(l.name), (state or {}).get(l.name), h,
                       train=train, rng=layer_rng,
                       compute_dtype=compute_dtype)
        if l.has_state:
            new_state[l.name] = s
    from cnn_tpu.nn.module import ResidualBlock
    return ResidualBlock.combine(h, x), (new_state or None)


def trunk_tp_pspecs(trunk: StackedBlocks, stage: str = "stage",
                    model: str = "model"):
    """Per-leaf PartitionSpec trees ``(params, state)`` for a TP'd trunk:
    leading ``[L]`` axis on 'stage', channel axes of the column conv and
    the layers between the pair on 'model', everything after the row conv
    replicated over 'model'. The trees match the trunk's params/state
    pytree structure exactly (shard_map in_specs requirement)."""
    col, row = tp_split_block(trunk.block)
    p_specs, s_specs = {}, {}
    after_row = False
    for l in trunk.block.body.layers:
        if l is col:
            p_specs[l.name] = {"w": P(stage, None, None, None, model),
                               "b": P(stage, model)}
        elif l is row:
            p_specs[l.name] = {"w": P(stage, None, None, model, None),
                               "b": P(stage)}
            after_row = True
        elif isinstance(l, BatchNorm2D):
            spec = P(stage) if after_row else P(stage, model)
            p_specs[l.name] = {"gamma": spec, "beta": spec}
            s_specs[l.name] = {"mean": spec, "var": spec}
        elif l.has_params or l.has_state:
            raise ValueError(f"unsupported parameterized TP body layer "
                             f"{l.name} ({type(l).__name__})")
    return {"body": p_specs}, {"body": s_specs}


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
    head = layers[i + 1:]
    if any(l.has_state for l in head):
        raise ValueError("layers after the pipelined trunk must be "
                         "stateless (their state is only computed validly "
                         "on the last stage)")
    return Sequential(layers[:i]), trunk, Sequential(head)


def _stage_chunk_apply(trunk: StackedBlocks, block_params, block_state, h, *,
                       train: bool, compute_dtype, rng_keys,
                       tp_axis: Optional[str]):
    """Apply this stage's ``[L/S]`` block slice to ``h`` (scan over blocks)
    — the shared chunk body of the GPipe and 1F1B schedules. Returns
    ``(y, new_block_state)``. The trunk's remat policy applies to the
    scanned body exactly as in ``StackedBlocks.apply``."""
    block, has_state = trunk.block, trunk.has_state
    xs = {"p": block_params}
    if has_state:
        xs["s"] = block_state
    if rng_keys is not None:
        xs["k"] = rng_keys

    def body(hh, inp):
        if tp_axis is not None:
            y, new_body = _tp_body_apply(
                block, inp["p"]["body"], (inp.get("s") or {}).get("body"),
                hh, train=train, rng=inp.get("k"),
                compute_dtype=compute_dtype, tp_axis=tp_axis)
            new_s = {"body": new_body} if has_state else None
        else:
            y, new_s = block.apply(inp["p"], inp.get("s"), hh, train=train,
                                   rng=inp.get("k"),
                                   compute_dtype=compute_dtype)
        return y, (new_s if has_state else None)

    if trunk.remat == "conv":  # mirror StackedBlocks' selective policy
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "conv_out", "bn_stats"))
    elif trunk.remat:  # same memory/recompute trade as the scanned trunk
        body = jax.checkpoint(body)
    y, new_st = lax.scan(body, h, xs)
    return y, (new_st if has_state else block_state)


def _gpipe_trunk(trunk: StackedBlocks, params_s, state_s, h, *,
                 n_stages: int, n_microbatches: int, train: bool,
                 compute_dtype=None, axis: str = "stage", rng_keys=None,
                 tp_axis: Optional[str] = None):
    """Per-device GPipe loop (call inside shard_map over ``axis``).

    ``params_s``/``state_s``: this stage's slice, leaves ``[L/S, ...]``.
    ``h``: the full local batch ``[B, ...]`` entering the trunk.
    ``rng_keys``: this stage's ``[L/S]`` slice of the trunk's per-block
    keys (rng-consuming blocks, e.g. Dropout). Keys depend on the BLOCK
    index only — never the tick — so the pipelined schedule draws exactly
    the masks the sequential scan draws (M=1 bitwise; with M > 1 every
    microbatch shares the block's mask, which is precisely the sequential
    semantics of a per-batch channel mask).
    Returns (trunk output ``[B, ...]`` — valid on the LAST stage only —
    and this stage's updated state slice).
    """
    S, M = n_stages, n_microbatches
    B = h.shape[0]
    assert B % M == 0, f"batch {B} must divide into {M} microbatches"
    x_mb = h.reshape(M, B // M, *h.shape[1:])
    s = lax.axis_index(axis)
    has_state = trunk.has_state

    def stage_apply(st, act):
        y, new_st = _stage_chunk_apply(trunk, params_s, st, act, train=train,
                                       compute_dtype=compute_dtype,
                                       rng_keys=rng_keys, tp_axis=tp_axis)
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


def _specs(model, mesh: Mesh, trunk):
    """(param/state in-out spec trees, batch spec) for shard_map. With a
    'model' axis in the mesh, the trunk gets per-leaf TP specs
    (trunk_tp_pspecs); otherwise a blanket P('stage') prefix."""
    data = "data" if "data" in mesh.axis_names else None
    tp = "model" in mesh.axis_names and mesh.shape["model"] > 1
    t_pspec, t_sspec = (trunk_tp_pspecs(trunk) if tp
                        else (P("stage"), P("stage")))
    pspec = {l.name: (t_pspec if l.name == trunk.name else P())
             for l in model.net.layers if l.has_params}
    sspec = {l.name: (t_sspec if l.name == trunk.name else P())
             for l in model.net.layers if l.has_state}
    return pspec, sspec, P(data)


def _make_1f1b_device_fn(stem, trunk, head, *, S: int, n_microbatches: int,
                         chunk: int, trunk_idx: int, compute_dtype,
                         label_smoothing: float, data_axis,
                         tp_axis: Optional[str], stem_state_names,
                         mix_on: bool, dst, V: int = 1):
    """Per-device 1F1B (one-forward-one-backward) pipeline step body.

    Memory-bounded pipelining (VERDICT r3 item 3). GPipe differentiates
    straight through the tick scan, so autodiff saves the residuals of all
    ``M + S - 1`` forward ticks before the reverse pipeline starts — live
    activations grow linearly in the microbatch count M. 1F1B instead
    hand-schedules the backward: the last stage back-propagates microbatch
    i in the SAME sub-slot its forward completes, the cotangent hops
    backward one stage per sub-slot, and each stage's deferred backward
    re-derives its chunk's vjp at the saved stage INPUT (activation
    checkpointing at stage granularity — the within-chunk residuals live
    only for the one sub-slot that consumes them).

    Schedule (classic warmup/steady/drain, as THREE static-length scans so
    every stage runs the same SPMD program with uniform collectives):

      - warmup, ``S - 1`` forward-only sub-slots: F-counts ``0 .. S-2``;
      - steady, ``M`` iterations of one F then one B sub-slot: iteration
        ``i`` runs F-count ``S - 1 + i`` and B-count ``i`` — the last
        stage's head+loss vjp seeds B(i) from F(i, last chunk) completed
        in the same iteration (``count_F - count_B = S - 1`` throughout,
        exactly the seed-availability bound);
      - drain, ``S - 1`` backward-only sub-slots: B-counts ``M .. M+S-2``.

    Stage s's work at F-count n is microbatch ``n - s``; at B-count n it
    is microbatch ``n - (S-1-s)`` — both bijections, so every stage's
    sub-slots are fully packed except the 2(S-1) edge slots that ARE the
    pipeline bubble. Wall cost: ``2M + 2S - 2`` chunk-applies per stage
    (ideal 2M), i.e. HALF the bubble of the uniform-tick eager schedule
    (one F and one B every tick, ``2M + 4S - 4``) this replaced in r4 —
    the warmup/drain sub-slots no longer pay for a masked garbage
    partner apply.

    Live-set arithmetic, per stage (microbatch activation = one chunk
    input, ``mb x H x W x C``):
      - GPipe (through-scan autodiff): ``M + S - 1`` ticks' saved
        residuals — O(M) for M >> S; the per-tick residual set follows the
        trunk's remat policy (~2 conv outputs/block at remat='conv').
      - 1F1B (this schedule): a ring buffer of ``2S - 1`` saved chunk
        inputs + one in-slot vjp working set — O(S), INDEPENDENT of M.
        (In-flight bound 2(S-1-s)+1 at stage s — buffer sized for stage 0.
        The textbook per-device warmup of ``S - s`` forwards would bound
        it by S - s, but a per-device warmup LENGTH is a per-device
        program, and collectives may not diverge across devices; the
        uniform S-1 warmup is the price of the SPMD formulation — it
        costs buffer slots, not bubble.)

    Compute: the deferred backward recomputes its chunk forward once — the
    same FLOP trade as ``remat=True``; schedule-equality is tested against
    GPipe in tests/test_1f1b.py (M=1 and microbatched, BN included).

    Semantics notes: BN batch statistics are per-microbatch exactly as in
    GPipe (the recomputed forward re-derives identical stats from the same
    saved input, so the vjp differentiates through the true stats); an
    rng-consuming head (e.g. head Dropout) draws its key per microbatch
    here versus per batch in GPipe — per-sample masks then differ for
    M > 1 (document-level caveat; the trunk's per-block keys are
    identical in both schedules).

    **Interleaved (virtual-stage) generalization, ``V > 1``** (VERDICT r4
    item 8, Megatron-LM's interleaved 1F1B): the trunk's ``C = V*S``
    chunks of ``chunk = L/C`` blocks place round-robin — chunk
    ``c = k*S + d`` on device ``d``, virtual index ``k`` — so each device
    fronts V points of the pipeline. The same three-phase machinery runs
    with every formula generalized: F(microbatch ``m = g*S + r``, chunk
    ``k*S + d``) at F-count ``n = g*C + k*S + r + d`` is still (i) a
    per-device bijection (``u = n - d = g*C + k*S + r`` is dense in
    ``[0, M*V)``), (ii) dependency-exact (consecutive chunks are exactly
    one sub-slot and one uniform ring hop apart, including the
    device-(S-1)->0 wrap between k and k+1), and (iii) seed-aligned (the
    head vjp of F(m, C-1) lands ``C - 1`` counts before B(m, C-1)
    consumes it, so warmup is ``C - 1`` sub-slots and the steady phase
    pairs F(C-1+i) with B(i)). The backward mirrors with
    ``B(m, c) at g*C + (V-1-k)*S + r + (S-1-d)``. Wall per device:
    ``2MV + 2S - 2`` sub-slots of a V-times-smaller chunk — bubble
    ``2(S-1)/V`` full-chunk equivalents, the classic 1/V reduction.
    Price: the input ring buffer holds ``2C - 1`` microbatch activations
    (~V x the V=1 ring; per-item F->B lifetime is at most ``2C - 2``
    F-counts, at (g=0, k=0, d=0)) and each F/B sub-slot's hop moves the
    same microbatch V times per traversal — V x ppermute traffic.
    Requires ``M % S == 0`` (the g/r decomposition that keeps the
    per-device F-counts dense; Megatron's constraint). The strided
    placement never leaks outside the step: params/state/grads cross the
    shard_map boundary in the canonical contiguous-[L] layout and a
    reshape-transpose relayout under GSPMD (one all-to-all of the trunk
    weights per step, ``make_pp_train_step``) maps storage row
    ``s*(V*l) + k*l + j`` <-> canonical block ``(k*S + s)*l + j`` — so
    checkpoints, EMA path-mirroring and ``shard_pp_train_state`` are
    untouched. V=1 degenerates to every classic formula above (the same
    code path runs both; the classic equality tests pin it).
    """
    from cnn_tpu.ops.losses import distillation_loss_from_probs

    M = n_microbatches
    C = V * S                      # total chunks; V=1 -> classic 1F1B
    BUF = 2 * C - 1                # ring of saved chunk inputs (per-item
    MV = M * V                     # F->B lifetime <= 2C-2 F-counts)
    steady = MV - S * (V - 1)      # V=1: M
    trunk_name = trunk.name
    has_state = trunk.has_state
    if V > 1:
        assert M % S == 0, \
            f"interleaved 1F1B needs microbatches ({M}) % stages ({S}) == 0"

    def device_fn(params, state, images, labels, rng, *extras):
        s = lax.axis_index("stage")
        last = S - 1
        it = iter(extras)
        labels2 = next(it) if mix_on else None
        lam = next(it) if mix_on else None
        t_probs = next(it) if dst else None

        all_keys = None
        if trunk.needs_rng and rng is not None:
            # the full per-block key array; each sub-slot slices its
            # chunk's rows at the CANONICAL block ids (k*S + s)*chunk —
            # exactly the keys the sequential scan folds for those blocks
            all_keys = jax.random.split(
                jax.random.fold_in(rng, trunk_idx), trunk.n_blocks)

        stem_params = {l.name: params[l.name] for l in stem.layers
                       if l.has_params}
        head_params = {l.name: params[l.name] for l in head.layers
                       if l.has_params}

        # stem runs full-batch up front; its vjp closes the step after the
        # scheduled scan has produced the stem-output cotangent
        def stem_fn(p):
            h, st, _ = stem.apply(p, state, images, train=True, rng=rng,
                                  compute_dtype=compute_dtype)
            return h, st
        (h, stem_state), stem_vjp = jax.vjp(stem_fn, stem_params)

        B = h.shape[0]
        assert B % M == 0, f"batch {B} must divide into {M} microbatches"
        mb = B // M
        x_mb = h.reshape(M, mb, *h.shape[1:])
        y_mb = labels.reshape(M, mb)
        y2_mb = labels2.reshape(M, mb) if mix_on else None
        tp_mb = t_probs.reshape(M, mb, -1) if dst else None

        # this device's trunk slice: [V*chunk, ...] leaves; virtual chunk
        # k occupies rows [k*chunk, (k+1)*chunk)
        t_params = params[trunk_name]

        def slice_chunk(tree, k):
            return jax.tree.map(
                lambda a: lax.dynamic_slice_in_dim(a, k * chunk, chunk, 0),
                tree)

        def merge_chunk(tree, k, upd, keep_mask):
            def one(a, u):
                cur = lax.dynamic_slice_in_dim(a, k * chunk, chunk, 0)
                return lax.dynamic_update_slice_in_dim(
                    a, jnp.where(keep_mask, u, cur), k * chunk, 0)
            return jax.tree.map(one, tree, upd)

        def add_chunk(tree, k, upd, mask):
            def one(a, u):
                cur = lax.dynamic_slice_in_dim(a, k * chunk, chunk, 0)
                return lax.dynamic_update_slice_in_dim(
                    a, cur + jnp.where(mask, u, 0.0), k * chunk, 0)
            return jax.tree.map(one, tree, upd)

        def chunk_fwd(tp_, st_, act, k):
            keys = None
            if all_keys is not None:
                kd = lax.dynamic_slice_in_dim(
                    jax.random.key_data(all_keys), (k * S + s) * chunk,
                    chunk)
                keys = jax.random.wrap_key_data(kd)
            return _stage_chunk_apply(trunk, tp_, st_, act, train=True,
                                      compute_dtype=compute_dtype,
                                      rng_keys=keys, tp_axis=tp_axis)

        def mb_loss(hp, out, i):
            # per-microbatch head + loss; the 1/M makes the accumulated
            # loss (and every cotangent seeded here) the batch mean
            logits, _, _ = head.apply(hp, {}, out, train=True, rng=rng,
                                      rng_offset=trunk_idx + 1,
                                      compute_dtype=compute_dtype)
            logits = logits.astype(jnp.float32)
            y = y_mb[i]
            ce = softmax_cross_entropy(logits, y, label_smoothing)
            if mix_on:
                ce = lam * ce + (1.0 - lam) * softmax_cross_entropy(
                    logits, y2_mb[i], label_smoothing)
            if dst:
                ce = dst[4] * ce + (1.0 - dst[4]) * \
                    distillation_loss_from_probs(logits, tp_mb[i], dst[3])
            correct = jnp.sum((jnp.argmax(logits, axis=-1) == y)
                              .astype(jnp.int32))
            return ce / M, correct

        perm_f = [(i, (i + 1) % S) for i in range(S)]
        perm_b = [(i, (i - 1) % S) for i in range(S)]

        def f_decode(u):
            """Per-device F sequence number u = g*C + k*S + r ->
            (microbatch m, virtual chunk k, ring slot). V=1: u = m, k = 0."""
            uc = jnp.clip(u, 0, MV - 1)
            g_i, q = uc // C, uc % C
            return g_i * S + q % S, q // S, uc % BUF

        def f_sub(carry, n_f):
            """One forward sub-slot: F-count ``n_f`` is F(m, k*S + s) with
            (m, k) decoded from ``u = n_f - s`` — chunk apply, input save,
            last-stage head+loss vjp on last-chunk items (the seed for the
            same steady iteration's B sub-slot), forward hop."""
            (act_in, cot, buf, st, g_tr, g_hd, d_stem, loss, corr,
             _seed) = carry
            u = n_f - s
            f_valid = jnp.logical_and(u >= 0, u < MV)
            m, k, wslot = f_decode(u)
            inp = jnp.where(jnp.logical_and(s == 0, k == 0), x_mb[m], act_in)
            st_k = slice_chunk(st, k) if has_state else st
            y_out, new_st = chunk_fwd(slice_chunk(t_params, k), st_k, inp, k)
            if has_state:
                # bubble sub-slots process garbage: mask their stat updates
                st = merge_chunk(st, k, new_st, f_valid)
            buf = buf.at[wslot].set(jnp.where(f_valid, inp, buf[wslot]))
            # last stage, last chunk: head+loss on the completed forward,
            # seeding the cotangent this iteration's B sub-slot consumes
            l_i, head_pull, c_i = jax.vjp(
                lambda hp, o: mb_loss(hp, o, m), head_params, y_out,
                has_aux=True)
            d_hp, seed_cot = head_pull(jnp.ones((), jnp.float32))
            live = jnp.logical_and(s == last,
                                   jnp.logical_and(k == V - 1, f_valid))
            loss = loss + jnp.where(live, l_i, 0.0)
            corr = corr + jnp.where(live, c_i, 0)
            g_hd = jax.tree.map(lambda a, d: a + jnp.where(live, d, 0.0),
                                g_hd, d_hp)
            act_nxt = lax.ppermute(y_out, "stage", perm_f)
            return (act_nxt, cot, buf, st, g_tr, g_hd, d_stem, loss, corr,
                    seed_cot)

        def b_sub(carry, n_b):
            """One backward sub-slot: B-count ``n_b`` is B(m, k*S + s) with
            ``u' = n_b - (S-1-s) = g*C + (V-1-k)*S + r`` — recompute-based
            chunk vjp at the saved input, backward hop."""
            (act, cot_in, buf, st, g_tr, g_hd, d_stem, loss, corr,
             seed_cot) = carry
            u = n_b - (S - 1 - s)
            b_valid = jnp.logical_and(u >= 0, u < MV)
            uc = jnp.clip(u, 0, MV - 1)
            g_i, q = uc // C, uc % C
            k, r = V - 1 - q // S, q % S
            m = g_i * S + r
            # the saved input lives at this item's F sequence number
            x_saved = buf[(g_i * C + k * S + r) % BUF]
            cot = jnp.where(jnp.logical_and(s == last, k == V - 1),
                            seed_cot, cot_in)
            st_k = slice_chunk(st, k) if has_state else st
            # recompute-based chunk vjp at the saved input (the chunk's
            # train-mode OUTPUT never reads `st` — BN normalizes with
            # batch stats — so differentiating the recompute is exact)
            _, chunk_pull = jax.vjp(
                lambda tp_, xx: chunk_fwd(tp_, st_k, xx, k)[0],
                slice_chunk(t_params, k), x_saved)
            d_tp, d_x = chunk_pull(cot)
            g_tr = add_chunk(g_tr, k, d_tp, b_valid)
            d_stem = d_stem.at[m].set(
                jnp.where(jnp.logical_and(s == 0,
                                          jnp.logical_and(k == 0, b_valid)),
                          d_x, d_stem[m]))
            cot_nxt = lax.ppermute(d_x, "stage", perm_b)
            return (act, cot_nxt, buf, st, g_tr, g_hd, d_stem, loss, corr,
                    seed_cot)

        zero_mb = jnp.zeros_like(x_mb[0])
        carry = (zero_mb, zero_mb,
                 jnp.zeros((BUF,) + zero_mb.shape, zero_mb.dtype),
                 state.get(trunk_name),
                 jax.tree.map(jnp.zeros_like, t_params),
                 jax.tree.map(jnp.zeros_like, head_params),
                 jnp.zeros((M,) + zero_mb.shape, zero_mb.dtype),
                 jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32),
                 zero_mb)
        # warmup: C-1 forward-only sub-slots (F-counts 0 .. C-2)
        carry, _ = lax.scan(lambda c, n: (f_sub(c, n), None), carry,
                            jnp.arange(C - 1))
        # steady: MV - S(V-1) iterations of F(C-1+i) then B(i) — the core
        carry, _ = lax.scan(
            lambda c, i: (b_sub(f_sub(c, C - 1 + i), i), None), carry,
            jnp.arange(steady))
        # drain: C-1 backward-only sub-slots (B-counts steady .. steady+C-2)
        carry, _ = lax.scan(lambda c, n: (b_sub(c, n), None), carry,
                            jnp.arange(steady, steady + C - 1))
        (_, _, _, trunk_state, g_tr, g_hd, d_stem, loss, corr, _) = carry

        # head grads live on the last stage only; stem-output cotangents on
        # stage 0 only — psum over 'stage' broadcasts both
        g_hd = jax.tree.map(lambda g: lax.psum(g, "stage"), g_hd)
        d_h = lax.psum(d_stem.reshape(B, *zero_mb.shape[1:]), "stage")
        (g_stem,) = stem_vjp((d_h, jax.tree.map(jnp.zeros_like, stem_state)))

        grads = {**g_stem, trunk_name: g_tr, **g_hd}
        loss = lax.psum(loss, "stage")
        correct = lax.psum(corr, "stage")
        if data_axis:
            grads = jax.tree.map(lambda g: lax.pmean(g, data_axis), grads)
            loss = lax.pmean(loss, data_axis)
            correct = lax.psum(correct, data_axis)
        new_state = {n: stem_state[n] for n in stem_state_names}
        if has_state:
            new_state[trunk_name] = trunk_state
        if data_axis:  # sync-BN style: average moving stats over data shards
            new_state = jax.tree.map(lambda a: lax.pmean(a, data_axis),
                                     new_state)
        return grads, new_state, loss, correct

    return device_fn


def make_pp_train_step(model, optimizer: Optimizer, mesh: Mesh, *,
                       n_microbatches: int, compute_dtype=None,
                       label_smoothing: float = 0.0, donate: bool = True,
                       grad_accum: int = 1, mixup: float = 0.0,
                       cutmix: float = 0.0, distill=None,
                       dataset=None, batch_size: Optional[int] = None,
                       augment_fn=None, sample_mode: str = "local",
                       steps_per_call: int = 1, schedule: str = "gpipe",
                       virtual_stages: int = 1):
    """Jitted pipeline-parallel train step.

    ``virtual_stages`` (V, 1F1B only): Megatron-style interleaved
    pipelining — each device owns V non-contiguous chunks of the trunk
    (chunk c of V*S on device c mod S), cutting the bubble to 2(S-1)/V
    chunk-applies at the cost of a V-deeper activation ring and V x
    ppermute traffic (schedule math in ``_make_1f1b_device_fn``). The
    strided placement is an internal per-step GSPMD relayout: params,
    state and grads cross this function's boundary in the canonical
    contiguous-[L] layout, so checkpoints/EMA/``shard_pp_train_state``
    are untouched. Requires ``n_microbatches % stages == 0``.

    Host-fed (``dataset=None``): ``(ts, images, labels) -> (ts, metrics)``.
    Device-resident (``dataset=DeviceDataset``): ``(ts) -> (ts, metrics)``
    — the HBM-pinned dataset is sampled on-device (uniform or the
    reference's epoch-permutation protocol, ``sample_mode``), augmented
    on-device (``augment_fn``), and fed straight into the pipeline, so the
    framework's fastest input path and its deepest-model path compose
    instead of excluding each other (the round-3 verdict's top item).

    The mesh must have a 'stage' axis (trunk depth) and may have a 'data'
    axis (batch). Forward+backward run inside one shard_map over the whole
    mesh with explicit collectives; everything batch-global — sampling,
    augmentation, mixup/cutmix pairing, the teachers' eval-mode forward —
    runs OUTSIDE the shard_map under GSPMD on the same mesh (teacher
    params are replicated; the mixed labels / teacher soft targets enter
    the shard_map sharded over 'data'). The optimizer update runs outside
    under GSPMD with the same placements (trunk params/opt state sharded
    on 'stage', everything else replicated).

    Toolbox composition (each mirrors the non-PP step's semantics exactly
    and is equivalence-tested in tests/test_pp_compose.py):

    - ``grad_accum > 1``: the batch splits into K shard-local chunks
      (``make_microbatch_regroup``); each chunk runs the full M-microbatch
      pipeline schedule under ``lax.scan`` and the mean gradient takes ONE
      optimizer step. Per-step live activations are bounded by a chunk's
      schedule, so effective batch scales past the per-chunk HBM limit.
    - ``mixup`` / ``cutmix``: pairs are mixed on the global batch before
      the pipeline; the last stage mixes the CE with (labels, labels[perm],
      lam) — identical math to ``train_step._loss_fn``. With
      ``grad_accum > 1`` pairs draw within each accumulation chunk (same
      marginal semantics; derivation mirrors ``accumulate_grads`` so the
      PP and sequential accumulated-mix steps are testably equal).
    - ``distill``: teachers run eval-mode on the (augmented, mixed) batch
      outside the shard_map — their forward is stage-replicable because it
      needs no schedule; the tempered mean soft-target enters sharded over
      'data' and the last stage adds the KD term.
    - ``steps_per_call > 1`` (device mode): that many steps chain inside
      one compiled program via ``lax.scan``, one host dispatch per chunk.
    """
    from cnn_tpu.parallel.train_step import (make_microbatch_regroup,
                                             mix_and_teacher_targets,
                                             normalize_distill)

    stem, trunk, head = pp_decompose(model)
    S = mesh.shape["stage"]
    assert trunk.n_blocks % S == 0, \
        f"{trunk.n_blocks} blocks must divide over {S} stages"
    pspec, sspec, bspec = _specs(model, mesh, trunk)
    data_axis = "data" if "data" in mesh.axis_names else None
    stem_state_names = [l.name for l in stem.layers if l.has_state]
    # full-net layer index of the trunk: rng keys must fold the SAME
    # indices Sequential.apply folds, or pipelined dropout masks diverge
    # from the sequential schedule
    trunk_idx = len(stem.layers)
    chunk = trunk.n_blocks // S
    tp_axis = ("model" if "model" in mesh.axis_names
               and mesh.shape["model"] > 1 else None)
    if tp_axis:
        tp_split_block(trunk.block)  # fail fast on unsupported shapes
    assert schedule in ("gpipe", "1f1b"), f"unknown schedule '{schedule}'"
    V = virtual_stages
    assert V >= 1
    if V > 1:
        assert schedule == "1f1b", \
            "virtual_stages > 1 is an interleaved-1F1B feature"
        assert trunk.n_blocks % (S * V) == 0, \
            f"{trunk.n_blocks} blocks must divide over {S} stages x {V} " \
            f"virtual chunks"

    mix_on = mixup > 0.0 or cutmix > 0.0
    dst = normalize_distill(distill, grad_accum=grad_accum)
    t_params0, t_states0 = (dst[1], dst[2]) if dst else (None, None)
    # shard_map in_specs for the optional per-batch extras (fixed by the
    # feature flags, so the traced signature is static)
    extra_specs = []
    if mix_on:
        extra_specs += [P(data_axis), P()]   # labels[perm], lam
    if dst:
        extra_specs.append(P(data_axis))     # mean tempered teacher probs

    def device_fn(params, state, images, labels, rng, *extras):
        s = lax.axis_index("stage")
        last = S - 1
        it = iter(extras)
        labels2 = next(it) if mix_on else None
        lam = next(it) if mix_on else None
        t_probs = next(it) if dst else None
        trunk_keys = None
        if trunk.needs_rng and rng is not None:
            # exactly StackedBlocks.apply's distribution (nn/module.py):
            # split(fold_in(rng, trunk_idx), L), then this stage's slice
            # (sliced via key_data — dynamic_slice needs a plain dtype)
            all_keys = jax.random.split(
                jax.random.fold_in(rng, trunk_idx), trunk.n_blocks)
            kd = lax.dynamic_slice_in_dim(
                jax.random.key_data(all_keys), s * chunk, chunk)
            trunk_keys = jax.random.wrap_key_data(kd)

        def full_loss(logits):
            # same composition as train_step._loss_fn: (mixed) CE + KD term
            ce = softmax_cross_entropy(logits, labels, label_smoothing)
            if mix_on:
                ce = lam * ce + (1.0 - lam) * softmax_cross_entropy(
                    logits, labels2, label_smoothing)
            if dst:
                from cnn_tpu.ops.losses import distillation_loss_from_probs
                ce = dst[4] * ce + (1.0 - dst[4]) * \
                    distillation_loss_from_probs(logits, t_probs, dst[3])
            return ce

        def loss_fn(params):
            h, stem_state, _ = stem.apply(params, state, images, train=True,
                                          rng=rng, compute_dtype=compute_dtype)
            out, trunk_state = _gpipe_trunk(
                trunk, params[trunk.name], state.get(trunk.name), h,
                n_stages=S, n_microbatches=n_microbatches, train=True,
                compute_dtype=compute_dtype, rng_keys=trunk_keys,
                tp_axis=tp_axis)
            logits, _, _ = head.apply(params, {}, out, train=True, rng=rng,
                                      rng_offset=trunk_idx + 1,
                                      compute_dtype=compute_dtype)
            logits = logits.astype(jnp.float32)
            # the pipeline output is only live on the last stage; stages
            # 0..S-2 contribute zero so the psum of local losses IS the loss
            loss = jnp.where(s == last, full_loss(logits), 0.0)
            correct = jnp.where(s == last, jnp.sum(
                (jnp.argmax(logits, axis=-1) == labels).astype(jnp.int32)), 0)
            return loss, (trunk_state, stem_state, correct)

        (loss, (trunk_state, stem_state, correct)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)

        def reduce_grad(name, g):
            # trunk grads live where their shard lives (stage x model —
            # sharded leaves are local; replicated-over-'model' leaves get
            # identical grads on every model shard since the bias/BN sit
            # outside the psum). Stem/head grads psum over 'stage' (only
            # the stage holding the live path contributes non-zero) and
            # are identical across 'model' (replicated compute).
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

    if schedule == "1f1b":
        device_fn = _make_1f1b_device_fn(
            stem, trunk, head, S=S, n_microbatches=n_microbatches,
            chunk=trunk.n_blocks // (S * V), trunk_idx=trunk_idx,
            compute_dtype=compute_dtype,
            label_smoothing=label_smoothing, data_axis=data_axis,
            tp_axis=tp_axis, stem_state_names=stem_state_names,
            mix_on=mix_on, dst=dst, V=V)

    spmd = jax.shard_map(device_fn, mesh=mesh,
                         in_specs=(pspec, sspec, bspec, bspec, P(),
                                   *extra_specs),
                         out_specs=(pspec, sspec, P(), P()),
                         check_vma=False)

    if V > 1:
        # the interleaved placement as a per-step GSPMD relayout: storage
        # row s*(V*l) + k*l + j <-> canonical block (k*S + s)*l + j. The
        # shard_map's P('stage') in_specs force the relayout (one
        # all-to-all of the trunk weights over ICI per call); everything
        # outside stays canonical, so checkpoints/EMA/placement code never
        # see the stride.
        def _inter(x):
            l = x.shape[0] // (S * V)
            return x.reshape((V, S, l) + x.shape[1:]).swapaxes(0, 1) \
                    .reshape(x.shape)

        def _deinter(x):
            l = x.shape[0] // (S * V)
            return x.reshape((S, V, l) + x.shape[1:]).swapaxes(0, 1) \
                    .reshape(x.shape)

        raw_spmd = spmd

        def spmd(params, state, *args):
            params = {**params,
                      trunk.name: jax.tree.map(_inter, params[trunk.name])}
            if trunk.has_state:
                state = {**state,
                         trunk.name: jax.tree.map(_inter, state[trunk.name])}
            g, st, loss, corr = raw_spmd(params, state, *args)
            g = {**g, trunk.name: jax.tree.map(_deinter, g[trunk.name])}
            if trunk.has_state:
                st = {**st,
                      trunk.name: jax.tree.map(_deinter, st[trunk.name])}
            return g, st, loss, corr

    regroup = (make_microbatch_regroup(mesh, grad_accum)
               if grad_accum > 1 and data_axis else None)

    def compute_grads(params, state, images, labels, k_model,
                      t_params, t_states):
        """Shared (host/device) batch body: mixing + teacher targets under
        GSPMD, then the pipelined fwd/bwd — once, or K-chunk accumulated.

        With ``grad_accum > 1``, mixup/cutmix pairs draw WITHIN each chunk
        (VERDICT r4 item 4b — same marginal semantics, chunk-sized pairing
        pool): the mix key splits off the step key exactly as the K=1 path
        does and chunk i folds its index, mirroring the sequential
        ``accumulate_grads`` derivation bit-for-bit so PP-with-accum equals
        sequential-with-accum (tested in tests/test_pp_compose.py)."""
        if grad_accum == 1:
            k_model, images, mix, dist = mix_and_teacher_targets(
                k_model, images, mixup=mixup, cutmix=cutmix, distill=dst,
                t_params=t_params, t_state=t_states,
                compute_dtype=compute_dtype)
            extras = []
            if mix is not None:
                extras += [labels[mix[0]], mix[1]]
            if dist is not None:
                extras.append(dist[0])
            return spmd(params, state, images, labels, k_model, *extras)
        K = grad_accum
        k_mix = None
        if mix_on:  # the same conditional split the K=1 path performs
            k_model, k_mix = jax.random.split(k_model)
        if regroup is not None:  # shard-local chunk slicing (no reshard)
            imgs, lbls = regroup(images, labels)
        else:
            mb = images.shape[0] // K
            assert images.shape[0] % K == 0, (images.shape, K)
            imgs = images.reshape((K, mb) + images.shape[1:])
            lbls = labels.reshape((K, mb))

        def micro(carry, xs):
            st, gacc, lacc, cacc = carry
            x, y, i = xs
            extras = []
            if mix_on:
                from cnn_tpu.ops.augment import batch_mix
                x, perm, lam = batch_mix(jax.random.fold_in(k_mix, i), x,
                                         mixup_alpha=mixup,
                                         cutmix_alpha=cutmix)
                extras += [y[perm], lam]
            if dst is not None:
                # teachers run per chunk on the (mixed) images (soft
                # targets are per-sample, so the accumulated KD loss
                # equals the full-batch computation)
                _, _, _, d = mix_and_teacher_targets(
                    k_model, x, mixup=0.0, cutmix=0.0, distill=dst,
                    t_params=t_params, t_state=t_states,
                    compute_dtype=compute_dtype)
                extras.append(d[0])
            g, st, l, c = spmd(params, st, x, y,
                               jax.random.fold_in(k_model, i), *extras)
            gacc = jax.tree.map(jnp.add, gacc, g)
            return (st, gacc, lacc + l, cacc + c), None

        zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, p.dtype), params)
        (st, gsum, lsum, csum), _ = lax.scan(
            micro, (state, zeros, jnp.zeros((), jnp.float32),
                    jnp.zeros((), jnp.int32)),
            (imgs, lbls, jnp.arange(K, dtype=jnp.int32)))
        grads = jax.tree.map(lambda g: g / K, gsum)
        return grads, st, lsum / K, csum

    if dataset is None:
        def host_step(ts: TrainState, images, labels, t_params=None,
                      t_states=None):
            images = _prep(images, compute_dtype)
            # same model-key derivation as the sequential step
            # (train_step.py: fold step, split off the augment stream) so
            # dropout masks match the unpipelined schedule bitwise
            rng, aug_rng = jax.random.split(jax.random.fold_in(ts.rng,
                                                               ts.step))
            if augment_fn is not None:
                images = augment_fn(aug_rng, images)
                if compute_dtype is not None:
                    images = images.astype(compute_dtype)
            grads, new_state, loss, correct = compute_grads(
                ts.params, ts.state, images, labels, rng, t_params,
                t_states)
            new_params, new_opt = optimizer.update(grads, ts.opt_state,
                                                   ts.params)
            new_opt = ema_update_state(new_opt, new_state)
            new_ts = TrainState(new_params, new_state, new_opt, ts.step + 1,
                                ts.rng)
            return new_ts, {"loss": loss, "correct": correct}

        jitted = jax.jit(host_step, donate_argnums=(0,) if donate else ())
        if dst is None:
            return jitted

        def run(ts, images, labels):
            return jitted(ts, images, labels, t_params0, t_states0)
        return run

    # ------ device-resident input path (the fast path, pipelined) ------
    from cnn_tpu.data.device_dataset import _make_epoch_sampler, _make_sampler
    from cnn_tpu.ops.preprocess import uint8_to_float

    assert batch_size is not None, "device mode needs batch_size"
    smesh = mesh if data_axis else None
    if smesh is not None:
        assert dataset.mesh is mesh, \
            "dataset must be uploaded onto the same PP mesh"
    epoch_mode = sample_mode in ("epoch", "epoch_fixed")
    if epoch_mode:
        sampler = _make_epoch_sampler(dataset, batch_size, smesh,
                                      fixed=sample_mode == "epoch_fixed")
    else:
        sampler = _make_sampler(dataset, batch_size, smesh, sample_mode)

    def one_step(ts: TrainState, images_ref, labels_ref, t_params, t_states):
        # identical key derivation to make_device_train_step, so the
        # pipelined device step is testably equal to the sequential one
        rng = jax.random.fold_in(ts.rng, ts.step)
        k_sample, k_aug, k_model = jax.random.split(rng, 3)
        if epoch_mode:
            images, labels = sampler(ts.rng, ts.step, images_ref, labels_ref)
        else:
            images, labels = sampler(k_sample, images_ref, labels_ref)
        if augment_fn is not None:
            images = augment_fn(k_aug, images)
            if compute_dtype is not None:
                images = images.astype(compute_dtype)
        else:
            images = uint8_to_float(images, compute_dtype or jnp.float32)
        grads, new_state, loss, correct = compute_grads(
            ts.params, ts.state, images, labels, k_model, t_params, t_states)
        new_params, new_opt = optimizer.update(grads, ts.opt_state, ts.params)
        new_opt = ema_update_state(new_opt, new_state)
        new_ts = TrainState(new_params, new_state, new_opt, ts.step + 1,
                            ts.rng)
        return new_ts, {"loss": loss, "correct": correct,
                        "batch": jnp.int32(batch_size)}

    step = one_step
    if steps_per_call > 1:
        def step(ts, images_ref, labels_ref, t_params, t_states):
            def body(carry, _):
                new_ts, m = one_step(carry, images_ref, labels_ref,
                                     t_params, t_states)
                return new_ts, (m["loss"], m["correct"])

            ts, (losses, corrects) = lax.scan(body, ts,
                                              length=steps_per_call)
            return ts, {"loss": jnp.mean(losses),
                        "correct": jnp.sum(corrects),
                        "batch": jnp.int32(batch_size * steps_per_call)}

    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())

    def run_device(ts: TrainState):
        return jitted(ts, dataset.images, dataset.labels,
                      t_params0, t_states0)

    return run_device


def make_pp_eval_step(model, mesh: Mesh, *, n_microbatches: int = 1,
                      compute_dtype=None, tta: str = ""):
    """Jitted pipeline-parallel eval: ``(params, state, images, labels) ->
    {loss, correct, pred}`` (train=False, moving BN stats).

    Ragged batches are fine: the batch is zero-padded up to the shard_map
    divisibility requirement (data_dim * M) inside the step, the forward
    returns gathered logits, and metrics are computed outside shard_map on
    the unpadded slice — matching the GSPMD eval path's semantics.

    ``tta``: test-time augmentation ('' | 'hflip' | 'flips') — the
    pipelined forward runs once per view and class probabilities average
    across views (the same ``_metrics_from_log_ps`` rule as the
    unpipelined eval step, so TTA'd numbers are comparable across paths).
    """
    from cnn_tpu.parallel.train_step import _TTA_VIEWS, _metrics_from_log_ps
    views = _TTA_VIEWS[tta]
    stem, trunk, head = pp_decompose(model)
    S = mesh.shape["stage"]
    pspec, sspec, bspec = _specs(model, mesh, trunk)
    data_axis = "data" if "data" in mesh.axis_names else None
    data_dim = mesh.shape.get("data", 1)
    tp_axis = ("model" if "model" in mesh.axis_names
               and mesh.shape["model"] > 1 else None)

    def device_fn(params, state, images):
        s = lax.axis_index("stage")
        h, _, _ = stem.apply(params, state, images, train=False,
                             compute_dtype=compute_dtype)
        out, _ = _gpipe_trunk(
            trunk, params[trunk.name], state.get(trunk.name), h,
            n_stages=S, n_microbatches=n_microbatches, train=False,
            compute_dtype=compute_dtype, tp_axis=tp_axis)
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
        log_ps = []
        for v in views(images):
            logits = spmd(params, state, v)[:b]
            log_ps.append(jax.nn.log_softmax(logits, axis=-1))
        return _metrics_from_log_ps(log_ps, labels)

    return step


def shard_pp_train_state(ts: TrainState, mesh: Mesh, model) -> TrainState:
    """Place a TrainState for pipeline parallelism: every leaf whose pytree
    path passes through the trunk's name shards its leading ``[L]`` axis over
    'stage'; everything else replicates. Optimizer buffers mirror their
    parameter's placement (their paths contain the same layer name).
    With a 'model' mesh axis, trunk leaves additionally take their
    per-leaf TP spec (trunk_tp_pspecs), looked up by the path segments
    after the trunk's name — which works for optimizer buffers too, since
    they mirror the param tree."""
    _, trunk, _ = pp_decompose(model)
    replicated = NamedSharding(mesh, P())
    staged = NamedSharding(mesh, P("stage"))
    tp_tree = None
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        p_specs, s_specs = trunk_tp_pspecs(trunk)
        tp_tree = {"body": {k: {**p_specs["body"].get(k, {}),
                                **s_specs["body"].get(k, {})}
                            for k in (p_specs["body"] | s_specs["body"])}}

    def leaf_sharding(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        if trunk.name not in names:
            return replicated
        sh = staged
        if tp_tree is not None:
            node = tp_tree
            for seg in names[names.index(trunk.name) + 1:]:
                if isinstance(node, dict) and seg in node:
                    node = node[seg]
            if isinstance(node, P):
                sh = NamedSharding(mesh, node)
        return sh

    if jax.process_count() > 1:
        # multi-host: device_put cannot target non-addressable devices, but
        # jit output shardings can place replicated host values anywhere on
        # the global mesh (every process holds identical state) — same
        # pattern as shard_train_state
        sharding_tree = TrainState(
            params=jax.tree_util.tree_map_with_path(leaf_sharding, ts.params),
            state=jax.tree_util.tree_map_with_path(leaf_sharding, ts.state),
            opt_state=jax.tree_util.tree_map_with_path(leaf_sharding,
                                                       ts.opt_state),
            step=replicated, rng=replicated)
        return jax.jit(lambda t: t, out_shardings=sharding_tree)(ts)

    def tree_place(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.device_put(leaf,
                                              leaf_sharding(path, leaf)),
            tree)

    return TrainState(params=tree_place(ts.params), state=tree_place(ts.state),
                      opt_state=tree_place(ts.opt_state),
                      step=jax.device_put(ts.step, replicated),
                      rng=jax.device_put(ts.rng, replicated))
