"""Device-resident dataset: train with ZERO steady-state host traffic.

Motivation (measured, tools/bench_input_pipeline.py): on this setup the
host->device link moves a 64-image uint8 batch in ~0.5 s while the train
step itself takes ~4 ms — transfer-bound by 100x. The whole 3-class dataset
is only ~0.5 GB as fixed-size uint8 canvases, so the TPU-native answer is to
upload it to HBM once and run *everything* on-device: per-step batch
sampling (uniform with replacement, `jax.random.randint` + `jnp.take`),
augmentation (ops/augment.py), normalization, and the train step — one
fused XLA program, no host in the loop.

Multi-chip: pass a ``Mesh`` and the dataset uploads sharded over the 'data'
axis; the train step then samples each device's sub-batch from its LOCAL
shard via ``shard_map`` (stratified uniform sampling — the split is
pre-shuffled, so shards are random subsets), which keeps the input path
entirely collective-free: no gathers, no all-to-alls, just local HBM reads.

The reference's equivalent is its per-sample host pipeline
(pipeline.cpp:112-164) which re-decodes every image every epoch.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cnn_tpu.data.loader import DataLoader
from cnn_tpu.optim import ema_update_state


class DeviceDataset:
    """Decode once on the host, pin (images, labels) in HBM, sample on-device."""

    def __init__(self, samples, image_size: int = 256, num_workers: int = 4,
                 sharding=None, mesh: Optional[Mesh] = None):
        n_global = len(samples)
        local = samples
        if mesh is not None and jax.process_count() > 1:
            # decode ONLY this process's contiguous row range of the padded
            # global array (pad rows re-list leading samples); decoding
            # everything on every host would multiply startup time and
            # peak RAM by the process count
            n_pad = n_global + (-n_global) % mesh.shape["data"]
            npp, rem = divmod(n_pad, jax.process_count())
            assert rem == 0, (n_pad, jax.process_count())
            lo = npp * jax.process_index()
            local = [samples[i % n_global] for i in range(lo, lo + npp)]
        # batch_size bounds the loader's in-flight decode futures: at 1 the
        # worker pool degenerates to serial decode (one future per yield)
        bs = max(1, min(8 * num_workers, len(local)))
        loader = DataLoader(local, batch_size=bs, augment=False,
                            shuffle=False, image_size=image_size,
                            num_workers=num_workers, cache=False)
        imgs = np.empty((len(local), image_size, image_size, 3), np.uint8)
        lbls = np.empty((len(local),), np.int32)
        pos = 0
        for img, lbl in loader:
            imgs[pos:pos + len(lbl)] = img
            lbls[pos:pos + len(lbl)] = lbl
            pos += len(lbl)
        assert pos == len(local), (pos, len(local))
        self._place(imgs, lbls, sharding, mesh, n_global=n_global)
        self.image_size = image_size

    @classmethod
    def from_arrays(cls, images: np.ndarray, labels: np.ndarray,
                    sharding=None, mesh: Optional[Mesh] = None):
        """Build directly from in-memory arrays (tests, synthetic data)."""
        self = cls.__new__(cls)
        self._place(np.asarray(images), np.asarray(labels, np.int32),
                    sharding, mesh)
        self.image_size = images.shape[1]
        return self

    def _place(self, imgs: np.ndarray, lbls: np.ndarray, sharding, mesh,
               n_global: Optional[int] = None):
        self.mesh = mesh
        self.n = len(imgs)
        # rows before shard-divisibility padding; the epoch sampler uses
        # this to keep pad duplicates out of the exactly-once protocol
        self.n_real = len(imgs)
        if mesh is not None:
            data_dim = mesh.shape["data"]
            img_sh = NamedSharding(mesh, P("data", None, None, None))
            lbl_sh = NamedSharding(mesh, P("data"))
            if jax.process_count() > 1:
                # multi-host: device_put cannot target non-addressable
                # devices, so assemble the global array from process-local
                # row ranges (mesh device order is process-major). __init__
                # hands us the local rows already; from_arrays hands the
                # full array, which is sliced here.
                ng = n_global or self.n
                n_pad = ng + (-ng) % data_dim
                npp, rem = divmod(n_pad, jax.process_count())
                assert rem == 0, (n_pad, jax.process_count())
                if len(imgs) != npp:
                    assert len(imgs) == ng, (len(imgs), ng, npp)
                    lo = npp * jax.process_index()
                    sel = [i % ng for i in range(lo, lo + npp)]
                    imgs, lbls = imgs[sel], lbls[sel]
                self.n = n_pad
                self.n_real = ng
                gshape = (n_pad, *imgs.shape[1:])
                self.images = jax.make_array_from_process_local_data(
                    img_sh, imgs, gshape)
                self.labels = jax.make_array_from_process_local_data(
                    lbl_sh, lbls, (n_pad,))
            else:
                # shard-divisible upload: pad by re-listing leading samples
                # (they are sampled with replacement anyway; padding keeps
                # every shard the same length so shard_map sampling needs
                # no masks)
                pad = (-len(imgs)) % data_dim
                if pad:
                    imgs = np.concatenate([imgs, imgs[:pad]])
                    lbls = np.concatenate([lbls, lbls[:pad]])
                self.n = len(imgs)
                self.images = jax.device_put(imgs, img_sh)
                self.labels = jax.device_put(lbls, lbl_sh)
        else:
            self.images = (jax.device_put(imgs, sharding)
                           if sharding is not None else jax.device_put(imgs))
            self.labels = jax.device_put(lbls)

    def sample(self, rng: jax.Array, batch_size: int):
        """On-device uniform sampling with replacement (call under jit)."""
        return _uniform_sample(rng, self.images, self.labels, batch_size,
                               self.n)

    def epoch_batches(self, batch_size: int):
        """Sequential full-epoch iteration (for eval): yields device slices.

        Iterates ``n_real`` rows — the shard-divisibility pad (duplicated
        leading samples re-listed at the global tail) must not be counted
        twice in eval metrics."""
        n = self.n_real
        for start in range(0, n - batch_size + 1, batch_size):
            yield (jax.lax.dynamic_slice_in_dim(self.images, start, batch_size),
                   self.labels[start:start + batch_size])
        rem = n % batch_size
        if rem:
            yield self.images[n - rem:n], self.labels[n - rem:n]


def _uniform_sample(key, images, labels, batch_size: int, n: int):
    """Uniform-with-replacement row sampling — the single definition behind
    ``DeviceDataset.sample`` and ``_make_sampler`` (pad rows, being
    duplicated real samples, are fair game under replacement)."""
    idx = jax.random.randint(key, (batch_size,), 0, n)
    return jnp.take(images, idx, axis=0), jnp.take(labels, idx, axis=0)


def _epoch_indices(base_key, step, batch_size: int, n: int, fixed: bool,
                   real_limit=None, repl_bound: int | None = None):
    """Without-replacement epoch iteration under jit: positions
    ``step*bs + i`` walk a per-epoch permutation of ``[0, n)``; a batch
    straddling an epoch boundary takes its tail from the next epoch's
    permutation — every sample is seen exactly once per epoch, the
    reference's training protocol (pipeline.cpp:145-151).

    ``fixed=True`` reproduces the reference's quirk exactly: it reshuffles
    with a freshly re-seeded engine each epoch (pipeline.cpp:149), i.e.
    the SAME permutation every epoch.

    ``real_limit``/``repl_bound`` handle shard-divisibility PADDING (rows
    ``[real_limit, n)`` duplicate real samples): a permutation slot landing
    on a pad row is remapped to a per-epoch random row in
    ``[0, repl_bound)``, so the inevitable extra visits (equal per-step
    shard contributions make strict exactly-once impossible when the shard
    count does not divide the dataset) rotate over the data instead of
    systematically re-visiting the same duplicated leading samples.
    """
    # int32-safe decomposition of g = step*bs + i (the direct product wraps
    # negative at step*bs >= 2^31 — ~8M steps at bs 256, one long run; x64
    # is disabled in jax by default so int64 is not an option): with
    # step = sq*n + sr, g = sq*bs*n + (sr*bs + i), hence
    # e = g//n = sq*bs + (sr*bs + i)//n and pos = g%n = (sr*bs + i) % n,
    # every intermediate bounded by n*bs (statically asserted) or the
    # epoch count.
    assert n * batch_size < 2**31, (n, batch_size)
    i = jnp.arange(batch_size, dtype=jnp.int32)
    sq, sr = step // n, step % n
    t = sr * batch_size + i
    e, pos = sq * batch_size + t // n, t % n
    # dedicated stream: the caller passes the SESSION key (the permutation
    # must be constant within an epoch), and the train step derives its
    # per-step keys as fold_in(session, step) — so folding the raw epoch id
    # here would collide with step==epoch_id's key. Tag the stream first.
    epoch_stream = jax.random.fold_in(base_key, 0x45504F43)  # "EPOC"

    def perm(eid):
        k = jax.random.fold_in(epoch_stream, jnp.where(fixed, 0, eid))
        return jax.random.permutation(k, n)

    p0, p1 = perm(e[0]), perm(e[0] + 1)
    idx = jnp.where(e == e[0], p0[pos], p1[pos])
    if repl_bound is not None:
        pad_stream = jax.random.fold_in(base_key, 0x50414444)  # "PADD"

        def repl(eid):
            k = jax.random.fold_in(pad_stream, jnp.where(fixed, 0, eid))
            return jax.random.randint(k, (batch_size,), 0, repl_bound)

        r = jnp.where(e == e[0], repl(e[0]), repl(e[0] + 1))
        idx = jnp.where(idx >= real_limit, r, idx)
    return idx


def _make_epoch_sampler(dataset: DeviceDataset, batch_size: int,
                        mesh: Optional[Mesh], fixed: bool):
    """(base_key, step, images_ref, labels_ref) -> (images, labels):
    epoch-permutation sampling (see ``_epoch_indices``). With a mesh, each
    data shard walks its own per-epoch permutation of its LOCAL rows —
    collective-free. When the shard count does not divide the dataset, the
    upload padded the global tail with duplicated leading samples; those
    pad slots (< data-shard count of them per epoch) are remapped to
    per-epoch random real rows of the same shard, so every real sample is
    seen at least once per epoch and no fixed sample is systematically
    seen twice."""
    n = dataset.n
    pad = n - getattr(dataset, "n_real", n)
    if mesh is None:
        # a batch straddles at most one epoch boundary (two permutations)
        assert batch_size <= n, (batch_size, n)

        def sample(base_key, step, images_ref, labels_ref):
            idx = _epoch_indices(base_key, step, batch_size, n, fixed)
            return (jnp.take(images_ref, idx, axis=0),
                    jnp.take(labels_ref, idx, axis=0))
        return sample

    data_dim = mesh.shape["data"]
    assert batch_size % data_dim == 0, (batch_size, data_dim)
    n_local = n // data_dim
    per_shard = batch_size // data_dim
    assert per_shard <= n_local, (
        f"per-shard batch {per_shard} exceeds the local shard ({n_local} "
        "rows) — a batch may straddle at most one epoch boundary")
    # pad rows are the padded global array's tail, i.e. the LAST shard's
    # local tail (pad < data_dim <= n_local rows)
    assert pad < n_local, (pad, n_local)

    def local_sample(base_key, step, images_ref, labels_ref):
        s = jax.lax.axis_index("data")
        k = jax.random.fold_in(base_key, s)
        real_limit = None if pad == 0 else jnp.where(
            s == data_dim - 1, n_local - pad, n_local)
        idx = _epoch_indices(k, step, per_shard, n_local, fixed,
                             real_limit=real_limit,
                             repl_bound=(n_local - pad) if pad else None)
        return (jnp.take(images_ref, idx, axis=0),
                jnp.take(labels_ref, idx, axis=0))

    return jax.shard_map(
        local_sample, mesh=mesh,
        in_specs=(P(), P(), P("data", None, None, None), P("data")),
        out_specs=(P("data", None, None, None), P("data")),
    )


def _make_sampler(dataset: DeviceDataset, batch_size: int,
                  mesh: Optional[Mesh], sample_mode: str):
    """(key, images_ref, labels_ref) -> (images, labels) sub-program.

    - no mesh: plain global uniform sampling.
    - mesh + 'local' (production): each data shard samples its sub-batch
      from its local rows under ``shard_map`` — zero collectives.
    - mesh + 'global': identical index sequence to the unsharded path
      (same key -> same batch), output constrained to P('data'); used by
      the single-device-equivalence tests, costs a cross-shard gather.

    The without-replacement modes 'epoch' / 'epoch_fixed' have a different
    signature (they need the step counter) and live in
    ``_make_epoch_sampler``.
    """
    n = dataset.n
    if mesh is None:
        def sample(k, images_ref, labels_ref):
            return _uniform_sample(k, images_ref, labels_ref, batch_size, n)
        return sample

    data_dim = mesh.shape["data"]
    assert batch_size % data_dim == 0, (batch_size, data_dim)
    if sample_mode == "global":
        img_sh = NamedSharding(mesh, P("data", None, None, None))
        lbl_sh = NamedSharding(mesh, P("data"))

        def sample(k, images_ref, labels_ref):
            idx = jax.random.randint(k, (batch_size,), 0, n)
            return (jax.lax.with_sharding_constraint(
                        jnp.take(images_ref, idx, axis=0), img_sh),
                    jax.lax.with_sharding_constraint(
                        jnp.take(labels_ref, idx, axis=0), lbl_sh))
        return sample

    assert sample_mode == "local", sample_mode
    n_local = n // data_dim
    per_shard = batch_size // data_dim

    def local_sample(k, images_ref, labels_ref):
        # refs here are the LOCAL [n/D, ...] shards
        k = jax.random.fold_in(k, jax.lax.axis_index("data"))
        return _uniform_sample(k, images_ref, labels_ref, per_shard, n_local)

    return jax.shard_map(
        local_sample, mesh=mesh,
        in_specs=(P(), P("data", None, None, None), P("data")),
        out_specs=(P("data", None, None, None), P("data")),
    )


def make_device_train_step(model, optimizer, dataset: DeviceDataset,
                           batch_size: int, *, compute_dtype=None,
                           augment_fn=None, donate: bool = True,
                           label_smoothing: float = 0.0,
                           mesh: Optional[Mesh] = None,
                           sample_mode: str = "local",
                           steps_per_call: int = 1,
                           grad_accum: int = 1,
                           mixup: float = 0.0, cutmix: float = 0.0,
                           distill=None):
    """Fully on-device train step: sampling + augment + fwd/bwd/update.

    Returns ``(ts) -> (ts, metrics)``. With ``mesh``, the batch is sampled
    shard-locally over the 'data' axis and the step runs SPMD with
    XLA-inserted gradient collectives — the fast input path and the
    multi-chip path compose instead of excluding each other.

    ``steps_per_call > 1`` chains that many steps inside ONE compiled
    program with ``lax.scan`` (each with its own sampled batch — the RNG
    folds ``ts.step``, which advances every scan iteration), so the host
    dispatches once per chunk instead of once per step — measured +7%
    end-to-end on the tunneled single-chip setup (45.4k -> 48.7k img/s at
    bs=256). Metrics are the chunk mean loss / summed correct.

    ``sample_mode``: 'local'/'global' draw uniform-with-replacement;
    'epoch' walks a fresh per-epoch permutation (every sample exactly once
    per epoch — the reference's protocol, pipeline.cpp:145-151);
    'epoch_fixed' additionally reproduces its same-permutation-every-epoch
    quirk (pipeline.cpp:149).

    ``grad_accum > 1``: the sampled batch is split into that many
    sequential microbatches whose gradients average into ONE optimizer
    update (``parallel.train_step.accumulate_grads``) — effective batch
    beyond the activation-HBM limit. Composes with ``steps_per_call``
    (the accumulation scan nests inside the steps chain).

    ``mixup`` / ``cutmix``: batch-pair label-mixing augmentation
    (``ops.augment.batch_mix``); with ``grad_accum > 1`` pairs draw
    within each accumulation chunk (``accumulate_grads``).

    ``distill``: ``(teacher_model, t_params, t_state, temperature, alpha)``
    — knowledge distillation; the teacher's eval-mode forward fuses into
    the same compiled step (see ``parallel.train_step.make_train_step``).
    Teacher params ride as jit arguments like the resident dataset does.
    """
    from cnn_tpu.parallel.train_step import (TrainState, _loss_fn,
                                             accumulate_grads,
                                             mix_and_teacher_targets,
                                             normalize_distill)
    from cnn_tpu.ops.preprocess import uint8_to_float

    if mesh is not None:
        assert dataset.mesh is mesh, "dataset must be uploaded onto the same mesh"
    dst = normalize_distill(distill, grad_accum=grad_accum)
    t_params0, t_state0 = (dst[1], dst[2]) if dst else (None, None)
    from cnn_tpu.parallel.train_step import make_microbatch_regroup
    regroup = (make_microbatch_regroup(mesh, grad_accum)
               if mesh is not None and grad_accum > 1 else None)
    epoch_mode = sample_mode in ("epoch", "epoch_fixed")
    if epoch_mode:
        sampler = _make_epoch_sampler(dataset, batch_size, mesh,
                                      fixed=sample_mode == "epoch_fixed")
    else:
        sampler = _make_sampler(dataset, batch_size, mesh, sample_mode)

    # NOTE: the resident arrays are jit ARGUMENTS, not closure captures — a
    # captured array would be constant-folded into the HLO and shipped to
    # the compiler (473 MB program...). As arguments they stay pinned in
    # HBM and the executable just reads them.
    def step(ts: TrainState, images_ref, labels_ref, t_params=None,
             t_state=None):
        rng = jax.random.fold_in(ts.rng, ts.step)
        k_sample, k_aug, k_model = jax.random.split(rng, 3)
        if epoch_mode:
            # the permutation key must be constant within an epoch, so it
            # derives from the session key + step, not the per-step fold
            images, labels = sampler(ts.rng, ts.step, images_ref, labels_ref)
        else:
            images, labels = sampler(k_sample, images_ref, labels_ref)
        if augment_fn is not None:
            images = augment_fn(k_aug, images)
            if compute_dtype is not None:
                images = images.astype(compute_dtype)
        else:
            images = uint8_to_float(images, compute_dtype or jnp.float32)
        if grad_accum > 1:
            grads, new_state, loss, correct = accumulate_grads(
                model, ts.params, ts.state, images, labels, k_model,
                grad_accum=grad_accum, compute_dtype=compute_dtype,
                label_smoothing=label_smoothing, regroup=regroup,
                distill=dst, t_params=t_params, t_state=t_state,
                mixup=mixup, cutmix=cutmix)
        else:
            k_model, images, mix, dist = mix_and_teacher_targets(
                k_model, images, mixup=mixup, cutmix=cutmix, distill=dst,
                t_params=t_params, t_state=t_state,
                compute_dtype=compute_dtype)
            grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
            (loss, (new_state, correct)), grads = grad_fn(
                ts.params, ts.state, model, images, labels, k_model, True,
                compute_dtype, False, label_smoothing, mix, dist)
        new_params, new_opt = optimizer.update(grads, ts.opt_state, ts.params)
        new_opt = ema_update_state(new_opt, new_state)
        new_ts = TrainState(new_params, new_state, new_opt, ts.step + 1, ts.rng)
        return new_ts, {"loss": loss, "correct": correct,
                        "batch": jnp.int32(batch_size)}

    if steps_per_call > 1:
        one = step

        def step(ts: TrainState, images_ref, labels_ref, t_params=None,
                 t_state=None):
            def body(carry, _):
                new_ts, m = one(carry, images_ref, labels_ref,
                                t_params, t_state)
                return new_ts, (m["loss"], m["correct"])

            ts, (losses, corrects) = jax.lax.scan(
                body, ts, length=steps_per_call)
            return ts, {"loss": jnp.mean(losses),
                        "correct": jnp.sum(corrects),
                        "batch": jnp.int32(batch_size * steps_per_call)}

    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())

    def run(ts: TrainState):
        return jitted(ts, dataset.images, dataset.labels,
                      t_params0, t_state0)

    return run
