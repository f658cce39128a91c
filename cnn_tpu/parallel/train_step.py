"""The jitted train/eval steps — single-chip and sharded.

Reference equivalent: the hot loop body of ``cnn.cpp:77-96`` (forward ->
softmax -> CE -> backward -> SGD -> accuracy), executed as five separate
single-threaded C++ phases. Here the whole thing is ONE compiled XLA
program: device-side uint8 normalize, forward, loss, backward (autograd),
optimizer update, and batch metrics all fuse under ``jax.jit`` with buffer
donation, so a step is a single device launch with no host round-trips.

Parallelism: with a ``Mesh``, the batch shards over the 'data' axis and the
classifier head over 'model'; gradients are reduced by XLA-inserted
collectives over ICI (the idiomatic replacement for the reference's
single-device loop; it had no NCCL/MPI to port — SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cnn_tpu.ops.preprocess import uint8_to_float
from cnn_tpu.optim import Optimizer, ema_update_state


class TrainState(NamedTuple):
    params: Any
    state: Any        # e.g. BatchNorm moving stats
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array


def create_train_state(model, optimizer: Optimizer, key: jax.Array,
                       dtype=jnp.float32) -> TrainState:
    k_init, k_train = jax.random.split(key)
    params, state = model.init(k_init, dtype)
    # seed the EMA'd model state eagerly (no-op for non-EMA optimizers) so
    # the opt_state pytree structure is stable from step 0 — a lazy first
    # materialization inside the jitted step would force a recompile
    opt_state = ema_update_state(optimizer.init(params), state)
    return TrainState(params=params, state=state, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32), rng=k_train)


def collect_aux_losses(new_state) -> jnp.ndarray:
    """Sum every 'aux_loss' scalar a layer wrote into its fresh state
    (e.g. the MoE balance loss, nn/moe.py). Called INSIDE the
    differentiated loss so the terms train their layers; zero when no
    layer opted in."""
    total = jnp.zeros((), jnp.float32)
    if not isinstance(new_state, dict):
        return total
    for k, v in new_state.items():
        if k == "aux_loss":
            total = total + v
        elif isinstance(v, dict):
            total = total + collect_aux_losses(v)
    return total


def _loss_fn(params, state, model, images, labels, rng, train, compute_dtype,
             remat=False, label_smoothing=0.0, mix=None, distill=None):
    apply = model.apply
    if remat:
        # rematerialize activations in the backward pass (trade FLOPs for
        # HBM) — lets batch sizes scale past activation-memory limits
        apply = jax.checkpoint(
            lambda p, s, x: model.apply(p, s, x, train=train, rng=rng,
                                        compute_dtype=compute_dtype),
            static_argnums=())
        logits, new_state, _ = apply(params, state, images)
    else:
        logits, new_state, _ = apply(params, state, images, train=train,
                                     rng=rng, compute_dtype=compute_dtype)
    logits = logits.astype(jnp.float32)
    from cnn_tpu.ops.losses import softmax_cross_entropy
    if mix is not None:
        # MixUp/CutMix (ops.augment.batch_mix): the images were blended
        # sample-i-with-sample-perm[i] at weight lam; mix the CE the same
        # way instead of materializing soft labels
        perm, lam = mix
        loss = (lam * softmax_cross_entropy(logits, labels, label_smoothing)
                + (1.0 - lam) * softmax_cross_entropy(logits, labels[perm],
                                                      label_smoothing))
    else:
        loss = softmax_cross_entropy(logits, labels, label_smoothing)
    if distill is not None:
        # knowledge distillation: (mean) teacher probabilities at
        # temperature T, computed OUTSIDE this differentiated function on
        # the same (augmented/mixed) images; alpha weights the hard CE term
        from cnn_tpu.ops.losses import distillation_loss_from_probs
        t_probs, temp, alpha = distill
        loss = alpha * loss + (1.0 - alpha) * distillation_loss_from_probs(
            logits, t_probs, temp)
    if train:
        loss = loss + collect_aux_losses(new_state)
    correct = jnp.sum((jnp.argmax(logits, axis=-1) == labels).astype(jnp.int32))
    return loss, (new_state, correct)


def _prep(images, compute_dtype):
    if images.dtype == jnp.uint8:
        return uint8_to_float(images, compute_dtype or jnp.float32)
    return images


def make_microbatch_regroup(mesh: Mesh, grad_accum: int):
    """[B]-batch -> [K, mb] microbatches with every row staying on its
    original 'data' shard.

    A plain ``reshape(K, mb)`` + ``with_sharding_constraint(P(None,
    'data'))`` asks GSPMD to move row ``k*mb+j`` to shard ``j/(mb/D)``
    while the sampler left row ``r`` on shard ``r/(B/D)`` — an all-to-all
    of the full batch per step, on the input hot path. Viewing the batch
    as ``[D, K, mb/D]`` and transposing to ``[K, D, mb/D]`` gives every
    microbatch an equal contiguous slice of every shard with zero data
    movement. Grouping only affects per-microbatch BN statistics and
    Dropout keys, never the mean gradient.
    """
    D = mesh.shape["data"]
    sp = "spatial" if "spatial" in mesh.axis_names else None
    K = grad_accum

    def one(x, spec):
        B = x.shape[0]
        mb = B // K
        if mb % D == 0:
            y = x.reshape((D, K, mb // D) + x.shape[1:])
            y = y.transpose((1, 0, 2) + tuple(range(3, y.ndim)))
            y = y.reshape((K, mb) + x.shape[1:])
        else:
            # microbatch smaller than the data axis: shard-local slicing
            # is impossible, pay the reshard (tiny batches only)
            y = x.reshape((K, mb) + x.shape[1:])
        return jax.lax.with_sharding_constraint(y, NamedSharding(mesh, spec))

    def regroup(images, labels):
        return (one(images, P(None, "data", sp)),
                one(labels, P(None, "data")))

    return regroup


def accumulate_grads(model, params, state, images, labels, rng, *,
                     grad_accum, compute_dtype=None, remat=False,
                     label_smoothing=0.0, regroup=None,
                     distill=None, t_params=None, t_state=None,
                     mixup=0.0, cutmix=0.0):
    """Mean gradients over ``grad_accum`` sequential microbatches.

    ``lax.scan`` re-uses one microbatch's activation memory for all K
    slices, so the effective batch scales past the HBM activation limit
    (BASELINE.md documents pipecnn w256 failing at bs>256 with saved conv
    outputs; ``--grad-accum`` buys the same effective batch back). Equal
    microbatch sizes make the mean-of-means exactly the full-batch mean;
    the per-parameter sum is accumulated in the parameter dtype (f32).

    Semantics under accumulation (same trade as GPipe microbatching,
    measured zero accuracy cost in BASELINE.md §r3): BatchNorm batch
    statistics are per-microbatch and moving stats update K times per
    step; rng-consuming layers (Dropout) get a distinct key per
    microbatch via ``fold_in``.

    ``distill`` (a ``normalize_distill`` result) runs each teacher's
    eval forward on every microbatch inside the scan — softmax targets
    are per-sample and microbatches are equal-sized, so the accumulated
    KD loss/gradient equals the full-batch computation exactly (tested).

    ``mixup``/``cutmix`` (VERDICT r4 item 4b) pair WITHIN each chunk —
    the same marginal semantics (MixUp pairs within whatever batch it is
    given), at a chunk-sized pairing pool. The mix key splits off the
    step key exactly as the unaccumulated path does and chunk i folds
    its index, with K=1 using the step's own mix stream — so K=1 through
    this scan computes the SAME mixed batch as the unaccumulated step
    (tested to float precision). Teachers see the mixed chunk, matching
    ``mix_and_teacher_targets``'s order.

    Returns ``(grads, new_state, loss, correct)`` — loss is the mean over
    microbatches, correct the sum (full-batch semantics).
    """
    K = grad_accum
    B = images.shape[0]
    assert B % K == 0, f"batch {B} not divisible by grad_accum {K}"
    mb = B // K
    do_mix = mixup > 0.0 or cutmix > 0.0
    k_mix = None
    if do_mix:  # the same conditional split the K=1 path performs
        rng, k_mix = jax.random.split(rng)
    if regroup is not None:  # mesh: shard-local microbatch slices
        imgs, lbls = regroup(images, labels)
    else:
        imgs = images.reshape((K, mb) + images.shape[1:])
        lbls = labels.reshape((K, mb))

    def micro(carry, xs):
        st, gacc, lacc, cacc = carry
        x, y, i = xs
        mix = None
        if do_mix:
            from cnn_tpu.ops.augment import batch_mix
            k_i = k_mix if K == 1 else jax.random.fold_in(k_mix, i)
            x, perm, lam = batch_mix(k_i, x, mixup_alpha=mixup,
                                     cutmix_alpha=cutmix)
            mix = (perm, lam)
        _, _, _, dist = mix_and_teacher_targets(
            rng, x, mixup=0.0, cutmix=0.0, distill=distill,
            t_params=t_params, t_state=t_state, compute_dtype=compute_dtype)
        (loss, (st, corr)), g = jax.value_and_grad(_loss_fn, has_aux=True)(
            params, st, model, x, y, jax.random.fold_in(rng, i), True,
            compute_dtype, remat, label_smoothing, mix, dist)
        gacc = jax.tree_util.tree_map(jnp.add, gacc, g)
        return (st, gacc, lacc + loss, cacc + corr), None

    zeros = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, p.dtype), params)
    (new_state, gsum, lsum, csum), _ = jax.lax.scan(
        micro, (state, zeros, jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.int32)),
        (imgs, lbls, jnp.arange(K, dtype=jnp.int32)))
    grads = jax.tree_util.tree_map(lambda g: g / K, gsum)
    return grads, new_state, lsum / K, csum


def normalize_distill(distill, *, grad_accum: int = 1):
    """Canonicalize a ``distill`` spec to list form.

    ``distill`` is ``(teacher_model(s), t_params, t_state, T, alpha)`` with
    the first three slots either scalars or lists (ensemble distillation).
    Returns ``(teachers, t_params, t_states, T, alpha)`` with list slots, or
    None. Shared by make_train_step and the device-resident step
    (data/device_dataset.py) so the two paths cannot diverge.
    """
    if distill is None:
        return None
    teacher, t_params0, t_state0, d_temp, d_alpha = distill
    if not isinstance(teacher, (list, tuple)):
        teacher = [teacher]
        t_params0, t_state0 = [t_params0], [t_state0]
    del grad_accum  # composes: teachers run per microbatch (accumulate_grads)
    return (list(teacher), list(t_params0), list(t_state0), d_temp, d_alpha)


def mix_and_teacher_targets(rng, images, *, mixup, cutmix, distill,
                            t_params, t_state, compute_dtype):
    """Shared step-body half: batch mixing + distillation soft targets.

    ``distill`` is a normalize_distill result (or None); ``t_params`` /
    ``t_state`` are the live jit-argument values for the teachers' params.
    Returns ``(rng, images, mix, dist)`` where ``mix=(perm, lam)`` when
    mixing is on and ``dist=(teacher_probs, T, alpha)`` when distilling —
    the trailing arguments of ``_loss_fn``.
    """
    mix = None
    if mixup > 0.0 or cutmix > 0.0:
        rng, mix_rng = jax.random.split(rng)
        from cnn_tpu.ops.augment import batch_mix
        images, perm, lam = batch_mix(mix_rng, images,
                                      mixup_alpha=mixup, cutmix_alpha=cutmix)
        mix = (perm, lam)
    dist = None
    if distill is not None:
        teachers, _, _, d_temp, d_alpha = distill
        t_probs = None
        for tm, tp, tsn in zip(teachers, t_params, t_state):
            tl, _, _ = tm.apply(tp, tsn, images, train=False,
                                compute_dtype=compute_dtype)
            p = jax.nn.softmax(tl.astype(jnp.float32) / d_temp, axis=-1)
            t_probs = p if t_probs is None else t_probs + p
        dist = (t_probs / len(teachers), d_temp, d_alpha)
    return rng, images, mix, dist


def make_train_step(model, optimizer: Optimizer, *, compute_dtype=None,
                    mesh: Optional[Mesh] = None, donate: bool = True,
                    augment_fn=None, remat: bool = False,
                    label_smoothing: float = 0.0, grad_accum: int = 1,
                    mixup: float = 0.0, cutmix: float = 0.0,
                    distill=None):
    """Returns jitted ``(train_state, images, labels) -> (train_state, metrics)``.

    ``images``: [B,H,W,C] uint8 (normalized on device) or float. ``labels``:
    [B] int32. ``metrics``: dict(loss f32, correct i32).

    ``augment_fn(rng, images) -> images`` runs on-device inside the step
    (e.g. ``ops.augment.augment_batch`` — the TPU-native replacement for the
    reference's host-side per-image OpenCV augmentation).

    ``grad_accum > 1`` splits the batch into that many sequential
    microbatches and averages their gradients before the single optimizer
    update (``accumulate_grads``) — the effective batch scales past the
    activation-memory limit at the cost of K sequential trunk passes.

    ``mixup`` / ``cutmix`` (Beta alphas, 0 = off) blend batch pairs and
    mix the loss accordingly (``ops.augment.batch_mix``). With
    ``grad_accum > 1`` pairs draw WITHIN each accumulation chunk (same
    marginal semantics, chunk-sized pairing pool — see
    ``accumulate_grads``); K=1 through the scan equals the unaccumulated
    mixed step on rng-free models (tested to float precision).

    ``distill``: ``(teacher_model, t_params, t_state, temperature, alpha)``
    — knowledge distillation (Hinton et al. 2015). The teacher forward runs
    eval-mode INSIDE the same compiled step on the same augmented/mixed
    images; the loss becomes ``alpha*CE + (1-alpha)*T^2*KL`` (see
    ``ops.losses``). Teacher params ride as jit arguments (never closure
    constants — they would fold into the HLO). The first three slots also
    accept LISTS (multi-teacher ensemble distillation: the target is the
    mean of the teachers' tempered softmaxes, Hinton §7).
    """
    dst = normalize_distill(distill, grad_accum=grad_accum)
    teacher, t_params0, t_state0 = (dst[:3] if dst else (None, None, None))
    regroup = (make_microbatch_regroup(mesh, grad_accum)
               if mesh is not None and grad_accum > 1 else None)

    def step(ts: TrainState, images, labels, t_params=None, t_state=None):
        step_rng = jax.random.fold_in(ts.rng, ts.step)
        # disjoint streams: Sequential folds small layer indices into the
        # model key, so augmentation must come from a split, never fold_in
        # of a constant that a layer index could collide with
        rng, aug_rng = jax.random.split(step_rng)
        if augment_fn is not None:
            images = augment_fn(aug_rng, images)
            if compute_dtype is not None:
                images = images.astype(compute_dtype)
        else:
            images = _prep(images, compute_dtype)
        if grad_accum > 1:
            grads, new_state, loss, correct = accumulate_grads(
                model, ts.params, ts.state, images, labels, rng,
                grad_accum=grad_accum, compute_dtype=compute_dtype,
                remat=remat, label_smoothing=label_smoothing,
                regroup=regroup, distill=dst, t_params=t_params,
                t_state=t_state, mixup=mixup, cutmix=cutmix)
        else:
            rng, images, mix, dist = mix_and_teacher_targets(
                rng, images, mixup=mixup, cutmix=cutmix, distill=dst,
                t_params=t_params, t_state=t_state,
                compute_dtype=compute_dtype)
            grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
            (loss, (new_state, correct)), grads = grad_fn(
                ts.params, ts.state, model, images, labels, rng, True,
                compute_dtype, remat, label_smoothing, mix, dist)
        new_params, new_opt = optimizer.update(grads, ts.opt_state, ts.params)
        new_opt = ema_update_state(new_opt, new_state)
        new_ts = TrainState(new_params, new_state, new_opt, ts.step + 1, ts.rng)
        return new_ts, {"loss": loss, "correct": correct}

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        jitted = jax.jit(step, donate_argnums=donate_argnums)
    else:
        # with a 'spatial' axis, activation ROWS shard too (the CNN analog of
        # sequence parallelism); the SPMD partitioner inserts halo exchanges
        # at shard boundaries for every conv/pool window that straddles them
        sp = "spatial" if "spatial" in mesh.axis_names else None
        image_sharding = NamedSharding(mesh, P("data", sp))
        label_sharding = NamedSharding(mesh, P("data"))

        def shard_step(ts, images, labels, t_params=None, t_state=None):
            images = jax.lax.with_sharding_constraint(images, image_sharding)
            labels = jax.lax.with_sharding_constraint(labels, label_sharding)
            return step(ts, images, labels, t_params, t_state)

        jitted = jax.jit(shard_step, donate_argnums=donate_argnums)
    if teacher is None:
        return jitted

    def run(ts, images, labels):
        return jitted(ts, images, labels, t_params0, t_state0)

    return run


_TTA_VIEWS = {
    "": (lambda x: (x,)),
    "hflip": (lambda x: (x, jnp.flip(x, axis=2))),
    "flips": (lambda x: (x, jnp.flip(x, axis=2), jnp.flip(x, axis=1),
                         jnp.flip(x, axis=(1, 2)))),
}


def _metrics_from_log_ps(log_ps, labels):
    """Eval metrics from per-view/per-model log-probabilities: average
    class PROBABILITIES, computed in log space — log(mean_i p_i) =
    logsumexp_i(log p_i) - log(n). Stable for confidently-wrong samples
    where softmax underflows to 0. The single definition shared by
    make_eval_step and make_ensemble_eval_step."""
    log_p = (jax.scipy.special.logsumexp(jnp.stack(log_ps), axis=0)
             - jnp.log(len(log_ps)))
    nll = -jnp.take_along_axis(log_p, labels[..., None], axis=-1)[..., 0]
    pred = jnp.argmax(log_p, axis=-1)
    return {"loss": jnp.mean(nll),
            "correct": jnp.sum((pred == labels).astype(jnp.int32)),
            "pred": pred}


def make_eval_step(model, *, compute_dtype=None, mesh: Optional[Mesh] = None,
                   tta: str = ""):
    """Returns jitted ``(params, state, images, labels) -> metrics`` (train=False).

    ``tta`` (test-time augmentation, superset — the reference evaluates the
    raw image only, cnn.cpp:100-110): '' = off, 'hflip' = average class
    probabilities over {identity, horizontal flip}, 'flips' = over all four
    flip combinations (the reference augment policy's flip set,
    pipeline.cpp:36-44). Probability averaging (not logit): the standard
    ensemble rule, and what keeps the reported loss a true NLL.
    """
    views = _TTA_VIEWS[tta]

    def step(params, state, images, labels):
        images = _prep(images, compute_dtype)
        log_ps = []
        for v in views(images):
            logits, _, _ = model.apply(params, state, v, train=False,
                                       compute_dtype=compute_dtype)
            log_ps.append(jax.nn.log_softmax(logits.astype(jnp.float32),
                                             axis=-1))
        return _metrics_from_log_ps(log_ps, labels)

    if mesh is None:
        return jax.jit(step)

    sp = "spatial" if "spatial" in mesh.axis_names else None
    image_sharding = NamedSharding(mesh, P("data", sp))
    label_sharding = NamedSharding(mesh, P("data"))

    replicated = NamedSharding(mesh, P())

    def shard_step(params, state, images, labels):
        images = jax.lax.with_sharding_constraint(images, image_sharding)
        labels = jax.lax.with_sharding_constraint(labels, label_sharding)
        out = step(params, state, images, labels)
        # per-sample predictions must be host-fetchable on every process
        # (multi-host: a 'data'-sharded array spans non-addressable devices)
        out["pred"] = jax.lax.with_sharding_constraint(out["pred"], replicated)
        return out

    return jax.jit(shard_step)


def make_ensemble_eval_step(models, *, compute_dtype=None, tta: str = ""):
    """Eval step over a MODEL ensemble (possibly mixed families): class
    probabilities average across every (model, TTA view) pair. Returns
    jitted ``(params_list, state_list, images, labels) -> metrics`` — the
    list pytrees ride as jit arguments. Superset: the reference has one
    fixed model per binary (inference.cpp:32-35).
    """
    models = list(models)
    views = _TTA_VIEWS[tta]

    def step(params_list, state_list, images, labels):
        images = _prep(images, compute_dtype)
        log_ps = []
        for mdl, p, s in zip(models, params_list, state_list):
            for v in views(images):
                logits, _, _ = mdl.apply(p, s, v, train=False,
                                         compute_dtype=compute_dtype)
                log_ps.append(jax.nn.log_softmax(
                    logits.astype(jnp.float32), axis=-1))
        return _metrics_from_log_ps(log_ps, labels)

    return jax.jit(step)


def make_forward(model, *, compute_dtype=None):
    """Jitted inference forward: images -> probs (reference inference.cpp:65-69)."""

    @jax.jit
    def fwd(params, state, images):
        images = _prep(images, compute_dtype)
        logits, _, _ = model.apply(params, state, images, train=False,
                                   compute_dtype=compute_dtype)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    return fwd


def model_pspecs(model, mesh: Mesh) -> dict:
    """Collect each layer's declared TP PartitionSpecs for this mesh.

    Returns ``{layer_name: {param_key: PartitionSpec}}``. Sharding intent is
    layer-spec metadata (``nn.module.Layer.param_pspecs``) — a model with
    unconventional layer names shards exactly as its specs declare, with no
    name matching here.
    """
    model_dim = mesh.shape.get("model", 1)
    has_ep = "expert" in mesh.axis_names
    stack = list(getattr(model, "layers", None) or model.net.layers)
    specs = {}
    while stack:
        layer = stack.pop()
        ps = layer.param_pspecs(model_dim)
        if has_ep:
            ep_fn = getattr(layer, "param_pspecs_ep", None)
            if ep_fn is not None:  # expert-parallel placement (nn/moe.py)
                ps = {**(ps or {}), **ep_fn()}
        if ps:
            specs[layer.name] = ps
        # recurse into composite layers (e.g. ResidualBlock): their nested
        # layer names appear as pytree path segments, so the lookup below
        # finds them at any depth
        body = getattr(layer, "body", None)
        if body is not None:
            stack.extend(body.layers)
        proj = getattr(layer, "proj", None)
        if proj is not None:
            stack.append(proj)
    return specs


def shard_train_state(ts: TrainState, mesh: Mesh, model=None) -> TrainState:
    """Place a TrainState onto the mesh (tensor parallelism over 'model').

    TP pattern for the conv->flatten->dense tail (declared per-layer via
    ``Layer.param_pspecs``): wide convs shard out-channels over 'model';
    the dense layer consuming the flattened features shards its in-features
    over the same axis, so the head matmul is a partial contraction that
    GSPMD finishes with a psum over ICI. Everything else (small convs,
    biases, BN stats) replicates. With ``model_parallel == 1`` (or
    ``model=None``) this is pure replication — plain DP.

    The same specs are applied to optimizer state: momentum buffers mirror
    their parameter's placement (their pytree paths contain the layer name).
    """
    replicated = NamedSharding(mesh, P())
    specs = model_pspecs(model, mesh) if model is not None else {}

    def leaf_sharding(path, leaf):
        if not specs or not hasattr(leaf, "ndim"):
            return replicated
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        for n in names:
            layer_spec = specs.get(n)
            if layer_spec and names[-1] in layer_spec:
                spec = layer_spec[names[-1]]
                # guard: only apply when every sharded dim divides
                ok = leaf.ndim == len(spec) and all(
                    ax is None or leaf.shape[d] % mesh.shape[ax] == 0
                    for d, ax in enumerate(spec))
                if ok:
                    return NamedSharding(mesh, spec)
        return replicated

    if jax.process_count() > 1:
        # multi-host: device_put cannot target non-addressable devices, but
        # jit output shardings can place replicated host values anywhere on
        # the global mesh (every process holds identical state)
        sharding_tree = TrainState(
            params=jax.tree_util.tree_map_with_path(leaf_sharding, ts.params),
            state=jax.tree_util.tree_map_with_path(leaf_sharding, ts.state),
            opt_state=jax.tree_util.tree_map_with_path(leaf_sharding,
                                                       ts.opt_state),
            step=replicated, rng=replicated)
        return jax.jit(lambda t: t, out_shardings=sharding_tree)(ts)

    def place(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.device_put(leaf, leaf_sharding(path, leaf)), tree)

    return TrainState(
        params=place(ts.params),
        state=place(ts.state),
        opt_state=place(ts.opt_state),
        step=jax.device_put(ts.step, replicated),
        rng=jax.device_put(ts.rng, replicated),
    )
