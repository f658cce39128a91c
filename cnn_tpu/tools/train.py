"""Training CLI — the reference's ``train`` binary (``cpu/src/cnn.cpp``).

Same loop structure: stream train batches, every ``valid_iters`` run
validation, every ``save_iters`` checkpoint with the accuracy-encoding
filename and track the best-by-valid-accuracy model, finish with a test
pass on the best checkpoint (``cnn.cpp:77-161``). Differences are the
TPU-native ones: one jitted fused step, device-side preprocessing, batched
validation, data-parallel mesh when multiple chips exist, and checkpoints
that carry optimizer/RNG/step state.

Usage: python -m cnn_tpu.tools.train [--total-iters N] [--batch-norm true] ...
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from cnn_tpu.core.config import parse_configs
from cnn_tpu import optim
from cnn_tpu.data import DataLoader, discover_dataset, split_dataset
from cnn_tpu.models import get_model
from cnn_tpu.parallel import (create_train_state, make_eval_step,
                              make_train_step, make_mesh, shard_train_state)
from cnn_tpu.utils.checkpoint import (checkpoint_name, load_checkpoint,
                                      save_checkpoint)
from cnn_tpu.utils.history import HistoryWriter
from cnn_tpu.utils.metrics import (ClassificationEvaluator, ConfusionMatrix,
                                   MeanLoss)
from cnn_tpu.utils.profiling import StepTimer, trace


def evaluate(eval_step, params, state, loader,
             confusion: ConfusionMatrix | None = None) -> tuple[float, float]:
    """Mean loss + accuracy over one epoch of ``loader``."""
    ev = ClassificationEvaluator()
    ml = MeanLoss()
    for images, labels in loader:
        m = eval_step(params, state, jnp.asarray(images), jnp.asarray(labels))
        ev.add_counts(int(m["correct"]), len(labels))
        ml.add(float(m["loss"]))
        if confusion is not None:
            confusion.compute(np.asarray(m["pred"]), labels)
    return ml.get(), ev.get()


def evaluate_device(eval_step, params, state, device_ds,
                    batch_size: int) -> tuple[float, float]:
    """Eval over a DeviceDataset (data already resident in HBM)."""
    ev = ClassificationEvaluator()
    ml = MeanLoss()
    for images, labels in device_ds.epoch_batches(batch_size):
        m = eval_step(params, state, images, labels)
        ev.add_counts(int(m["correct"]), int(labels.shape[0]))
        ml.add(float(m["loss"]))
    return ml.get(), ev.get()


def main(argv=None):
    # Preemption safety: TPU pools reclaim nodes with SIGTERM. Convert it
    # into a request for a clean stop instead of dying mid-step; the train
    # loop then checkpoints and exits 0, and a relaunch with --resume auto
    # continues from that checkpoint. Installed first thing so a signal
    # during dataset load / compile also stops cleanly at the first
    # completed iteration. Single-process: stop at the next loop iteration.
    # Multi-host: a one-sided break would desynchronize the collective step
    # schedule and hang the pod, so the flag is allgathered at validation
    # boundaries (already a sync point) and every process stops together.
    # Previous handlers are RESTORED on exit: in-process callers (the test
    # suite, notebooks) must not be left with a handler that appends to a
    # dead list — their own SIGTERM would be silently swallowed.
    preempted = []
    import signal as _signal
    prev_handlers = {}
    for _sig in (_signal.SIGTERM, _signal.SIGUSR1):
        try:
            prev_handlers[_sig] = _signal.signal(
                _sig, lambda *_: preempted.append(True))
        except (ValueError, OSError):  # non-main thread / platform quirk
            pass
    try:
        return _main(argv, preempted)
    finally:
        for _sig, _h in prev_handlers.items():
            if _h is None:
                # previous handler was not installed from Python (C-level):
                # signal.signal(sig, None) raises TypeError — nothing to
                # restore, the C handler is still in place
                continue
            try:
                _signal.signal(_sig, _h)
            except (ValueError, OSError):
                pass


def _main(argv, preempted):
    model_cfg, data_cfg, train_cfg, ns = parse_configs(argv, "cnn_tpu train")

    if train_cfg.compile_cache:
        # persistent compilation cache: the big remat'd-scan programs
        # compile in minutes; identical re-launches (resume-after-preempt,
        # hyperparameter sweeps varying only data) hit the cache instead
        os.makedirs(train_cfg.compile_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          train_cfg.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if train_cfg.multihost:
        # multi-host SPMD: every host runs this same program; the mesh spans
        # all hosts' devices and XLA routes collectives over ICI/DCN (CPU
        # smoke: tools/multihost_smoke.py + tests/test_multihost.py). The
        # seeded host loader produces IDENTICAL global batches on every
        # process, so uncommitted inputs are valid replicated global arrays
        # that the sharding constraint then splits locally.
        kwargs = {}
        if train_cfg.coordinator:
            kwargs["coordinator_address"] = train_cfg.coordinator
        if train_cfg.num_processes > 0:        # 0 = from env / TPU metadata
            kwargs["num_processes"] = train_cfg.num_processes
        if train_cfg.process_id >= 0:
            kwargs["process_id"] = train_cfg.process_id
        jax.distributed.initialize(**kwargs)
        print(f"multihost: process {jax.process_index()}/{jax.process_count()}")

    is_main = jax.process_index() == 0
    samples = discover_dataset(data_cfg.dataset_path, data_cfg.categories)
    splits = split_dataset(samples, data_cfg.train_ratio, data_cfg.test_ratio,
                           data_cfg.split_seed)
    print(f"train  :  {len(splits['train'])}\n"
          f"test   :  {len(splits['test'])}\n"
          f"valid  :  {len(splits['valid'])}")

    device_augment = data_cfg.device_augment and data_cfg.augment
    train_loader = valid_loader = None
    if not data_cfg.device_dataset:
        train_loader = DataLoader(splits["train"], train_cfg.train_batch_size,
                                  augment=data_cfg.augment and not device_augment,
                                  shuffle=True,
                                  image_size=(data_cfg.canvas_size if device_augment
                                              else data_cfg.image_size),
                                  seed=data_cfg.loader_seed,
                                  num_workers=data_cfg.num_workers,
                                  prefetch=data_cfg.prefetch,
                                  backend=data_cfg.backend, cache=data_cfg.cache)
        valid_loader = DataLoader(splits["valid"], train_cfg.valid_batch_size,
                                  augment=False, shuffle=False,
                                  image_size=data_cfg.image_size,
                                  backend=data_cfg.backend, cache=data_cfg.cache)

    if model_cfg.space_to_depth and model_cfg.name != "alexnet":
        sys.exit(f"--space-to-depth applies to the AlexNet family only "
                 f"(its small-Cin stride-2 conv1); --name {model_cfg.name} "
                 f"does not accept it")
    model = get_model(model_cfg.name, num_classes=model_cfg.num_classes,
                      batch_norm=model_cfg.batch_norm,
                      dropout=model_cfg.dropout,
                      image_size=model_cfg.image_size,
                      **({"space_to_depth": True}
                         if model_cfg.space_to_depth else {}),
                      **({"balance_coeff": model_cfg.moe_balance}
                         if model_cfg.moe_balance > 0.0 else {}),
                      **({"width": (int(model_cfg.width)
                                    if float(model_cfg.width).is_integer()
                                    else model_cfg.width)}
                         if model_cfg.width > 0 else {}),
                      **({"n_blocks": model_cfg.n_blocks}
                         if model_cfg.n_blocks > 0 else {}))
    opt = optim.make_optimizer(train_cfg.optimizer, train_cfg.learning_rate,
                               train_cfg.momentum,
                               schedule=train_cfg.lr_schedule,
                               total_steps=train_cfg.total_iters,
                               warmup_steps=train_cfg.warmup_steps,
                               weight_decay=train_cfg.weight_decay,
                               grad_clip=train_cfg.grad_clip)
    if train_cfg.freeze:
        # freeze subtrees by path prefix (head-only fine-tuning with
        # --init-from); init asserts the prefixes match something
        opt = optim.with_frozen(opt, train_cfg.freeze.split(","))
        print(f"frozen param prefixes: {train_cfg.freeze}")
    if train_cfg.ema > 0.0:
        opt = optim.with_ema(opt, train_cfg.ema)
        print(f"weight EMA: decay {train_cfg.ema} "
              "(validation/test use the averaged weights)")

    n_dev = len(jax.devices())
    mesh = pp_mesh = None
    if train_cfg.pipeline_stages > 1:
        # GPipe/1F1B pipeline parallelism (parallel/pipeline.py): its own
        # ('data', 'stage') mesh and explicit-collective train step. The
        # full toolbox composes here — device-resident dataset, device
        # augmentation, mixup/cutmix, distillation, grad accumulation,
        # steps-per-call, TTA eval (round-4 work; tests/test_pp_compose.py)
        from jax.sharding import Mesh as _Mesh
        stages = train_cfg.pipeline_stages
        dp = train_cfg.data_parallel or max(1, n_dev // stages)
        # the real constraint is PER DATA SHARD PER ACCUMULATION CHUNK:
        # each chunk's sub-batch must split into the GPipe microbatches
        assert train_cfg.train_batch_size % (dp * train_cfg.grad_accum) \
            == 0, \
            f"--train-batch-size {train_cfg.train_batch_size} must divide " \
            f"over {dp} data shards x {train_cfg.grad_accum} accum chunks"
        per_chunk = train_cfg.train_batch_size // dp // train_cfg.grad_accum
        assert per_chunk % train_cfg.microbatches == 0, \
            f"per-shard per-chunk batch {per_chunk} must divide into " \
            f"{train_cfg.microbatches} microbatches"
        devs = jax.devices()[:dp * stages]
        pp_mesh = _Mesh(np.asarray(devs).reshape(dp, stages),
                        ("data", "stage"))
        print(f"pipeline mesh: {dict(pp_mesh.shape)} "
              f"(microbatches {train_cfg.microbatches}, "
              f"schedule {train_cfg.pipeline_schedule})")
    elif (n_dev > 1 or train_cfg.model_parallel > 1
            or train_cfg.spatial_parallel > 1
            or train_cfg.expert_parallel > 1):
        mesh = make_mesh(train_cfg.data_parallel, train_cfg.model_parallel,
                         train_cfg.spatial_parallel,
                         train_cfg.expert_parallel)
        print(f"mesh: {dict(mesh.shape)}")

    compute_dtype = jnp.bfloat16 if model_cfg.compute_dtype == "bfloat16" else None
    ts = create_train_state(model, opt, jax.random.key(train_cfg.seed))
    if train_cfg.init_from:
        from cnn_tpu.utils.checkpoint import warm_start
        ts, copied, skipped = warm_start(ts, train_cfg.init_from, opt)
        print(f"warm start from {train_cfg.init_from}: "
              f"{len(copied)} tensors copied"
              + (f", kept fresh: {', '.join(skipped)}" if skipped else ""))
    if pp_mesh is not None:
        from cnn_tpu.parallel import shard_pp_train_state
        ts = shard_pp_train_state(ts, pp_mesh, model)
    elif mesh is not None:
        ts = shard_train_state(ts, mesh, model)

    resume = train_cfg.resume
    if resume == "auto":
        # resume from the newest checkpoint in checkpoint_dir, if any
        import glob as _glob
        cks = sorted(_glob.glob(os.path.join(train_cfg.checkpoint_dir, "*.ckpt")),
                     key=os.path.getmtime)
        resume = cks[-1] if cks else ""
    start_iters = train_cfg.start_iters
    if resume and os.path.exists(resume):
        ts = load_checkpoint(resume)
        # legacy pre-round-4 --ema checkpoints lack the EMA'd model state;
        # seed it HERE (host-side, before sharding) so the jitted step's
        # opt_state structure is stable — a lazy fill inside a
        # steps-per-call lax.scan would change the carry pytree mid-scan
        ts = ts._replace(opt_state=optim.ema_seed_model_state(
            ts.opt_state, ts.state,
            decay=train_cfg.ema if train_cfg.ema > 0.0 else None))
        if pp_mesh is not None:
            from cnn_tpu.parallel import shard_pp_train_state
            ts = shard_pp_train_state(ts, pp_mesh, model)
        elif mesh is not None:
            # load_checkpoint returns host-replicated arrays; restore the
            # DP/TP placement the fresh state had
            ts = shard_train_state(ts, mesh, model)
        start_iters = max(start_iters, int(ts.step) + 1)
        print(f"resumed from {resume} at step {int(ts.step)}")
    if jax.process_count() > 1:
        # every process must enter the loop at the SAME iteration — a
        # divergent '--resume auto' (e.g. per-host checkpoint dirs) would
        # desynchronize the collective step schedule and hang the pod
        from jax.experimental import multihost_utils
        steps = np.asarray(multihost_utils.process_allgather(
            np.asarray([start_iters], np.int64)))
        if not (steps == steps.flat[0]).all():
            raise RuntimeError(
                f"resume state diverges across processes (start iters "
                f"{steps.ravel().tolist()}); use a shared checkpoint dir or "
                f"an explicit --resume path present on every host")

    augment_fn = None
    if data_cfg.color_jitter > 0.0 and not (
            (device_augment or data_cfg.device_dataset) and data_cfg.augment):
        sys.exit("--color-jitter is applied by the device-side augmentation "
                 "pipeline; it needs --augment true plus --device-augment "
                 "or --device-dataset (on the host-loader path it would "
                 "silently do nothing)")
    if device_augment or data_cfg.device_dataset:
        from cnn_tpu.ops.augment import augment_batch, augment_batch_fast
        aug = augment_batch_fast if data_cfg.augment_mode == "fast" else augment_batch

        if data_cfg.augment:
            def augment_fn(rng, images):
                # augment in the compute dtype: the 8-bit-mantissa loss is
                # below the uint8 input quantization, and the shear/resize
                # passes are bandwidth-bound (2x faster in bf16)
                k_geo, k_col = jax.random.split(rng)
                x = aug(k_geo, images, out_size=data_cfg.image_size,
                        dtype=compute_dtype or jnp.float32)
                if data_cfg.color_jitter > 0.0:
                    from cnn_tpu.ops.augment import color_jitter
                    x = color_jitter(k_col, x, data_cfg.color_jitter)
                return x
            print(f"augmentation: on-device '{data_cfg.augment_mode}' "
                  + (f"+ color jitter {data_cfg.color_jitter} "
                     if data_cfg.color_jitter > 0.0 else "")
                  + "(fused into the train step)")

    distill = None
    if train_cfg.distill_from:
        # knowledge distillation: the teacher's eval-mode forward fuses
        # into the compiled train step; EMA-trained teachers contribute
        # their averaged weights
        from cnn_tpu.utils.checkpoint import tree_has_bn
        # comma-separated lists = ensemble distillation (the target is the
        # mean of the teachers' tempered softmaxes)
        t_ckpts = [c for c in train_cfg.distill_from.split(",") if c]
        # each teacher spec is family[@key=val...] — shaped teachers
        # (e.g. pipecnn@width=256@n_blocks=8) enable cross-family
        # ensembles whose members don't share the student's geometry
        t_specs = ([n for n in train_cfg.distill_model.split(",") if n]
                   or [model_cfg.name])
        if len(t_specs) == 1:
            t_specs = t_specs * len(t_ckpts)
        assert len(t_specs) == len(t_ckpts), \
            "--distill-model must list one family (shared) or one per ckpt"
        teachers, t_params, t_states = [], [], []
        for t_spec, ck in zip(t_specs, t_ckpts):
            t_name, *t_kv = t_spec.split("@")
            t_kwargs = {}
            for kv in t_kv:
                k, v = kv.split("=", 1)
                t_kwargs[k.replace("-", "_")] = (
                    int(v) if v.lstrip("-").isdigit() else float(v))
            t_ts = load_checkpoint(ck)
            p = optim.ema_params(t_ts.opt_state)
            t_params.append(t_ts.params if p is None else p)
            t_states.append(t_ts.state if p is None else
                            optim.ema_model_state(t_ts.opt_state, t_ts.state))
            # the teacher's BN-ness is a property of its checkpoint, not of
            # the student config: detect it structurally from the saved
            # param tree ({gamma, beta} subtrees — utils.checkpoint)
            teachers.append(get_model(t_name,
                                      num_classes=model_cfg.num_classes,
                                      image_size=model_cfg.image_size,
                                      batch_norm=tree_has_bn(t_ts.params),
                                      **t_kwargs))
        distill = (teachers, t_params, t_states,
                   train_cfg.distill_temp, train_cfg.distill_alpha)
        print(f"distilling from {len(teachers)} teacher(s) "
              f"{list(zip(t_specs, t_ckpts))} "
              f"(T={train_cfg.distill_temp}, alpha={train_cfg.distill_alpha})")

    device_train_ds = device_valid_ds = None
    if data_cfg.device_dataset:
        from cnn_tpu.data.device_dataset import (DeviceDataset,
                                                 make_device_train_step)
        canvas = data_cfg.canvas_size if data_cfg.augment else data_cfg.image_size
        print(f"uploading dataset to device (canvas {canvas}px)...")
        # train set shards over the mesh's 'data' axis (each chip samples
        # its sub-batch from local HBM); valid stays unsharded so epoch
        # iteration needs no padding
        ds_mesh = pp_mesh if pp_mesh is not None else mesh
        device_train_ds = DeviceDataset(splits["train"], canvas,
                                        data_cfg.num_workers, mesh=ds_mesh)
        device_valid_ds = DeviceDataset(splits["valid"], data_cfg.image_size,
                                        data_cfg.num_workers)
        if pp_mesh is not None:
            # the fastest input path feeds the pipelined model: on-device
            # sampling + augmentation fused into the PP step
            from cnn_tpu.parallel import make_pp_train_step
            step_fn = make_pp_train_step(
                model, opt, pp_mesh,
                n_microbatches=train_cfg.microbatches,
                compute_dtype=compute_dtype, donate=train_cfg.donate,
                label_smoothing=train_cfg.label_smoothing,
                grad_accum=train_cfg.grad_accum,
                mixup=train_cfg.mixup, cutmix=train_cfg.cutmix,
                distill=distill, dataset=device_train_ds,
                batch_size=train_cfg.train_batch_size,
                augment_fn=augment_fn, sample_mode=data_cfg.sample_mode,
                steps_per_call=train_cfg.steps_per_call,
                schedule=train_cfg.pipeline_schedule,
                virtual_stages=train_cfg.virtual_stages)
        else:
            step_fn = make_device_train_step(
                model, opt, device_train_ds, train_cfg.train_batch_size,
                compute_dtype=compute_dtype, augment_fn=augment_fn,
                donate=train_cfg.donate,
                label_smoothing=train_cfg.label_smoothing, mesh=mesh,
                sample_mode=data_cfg.sample_mode,
                steps_per_call=train_cfg.steps_per_call,
                grad_accum=train_cfg.grad_accum,
                mixup=train_cfg.mixup, cutmix=train_cfg.cutmix,
                distill=distill)
    elif pp_mesh is not None:
        from cnn_tpu.parallel import make_pp_train_step
        step_fn = make_pp_train_step(
            model, opt, pp_mesh, n_microbatches=train_cfg.microbatches,
            compute_dtype=compute_dtype, donate=train_cfg.donate,
            label_smoothing=train_cfg.label_smoothing,
            grad_accum=train_cfg.grad_accum,
            mixup=train_cfg.mixup, cutmix=train_cfg.cutmix,
            distill=distill, augment_fn=augment_fn,
            schedule=train_cfg.pipeline_schedule,
            virtual_stages=train_cfg.virtual_stages)
    else:
        step_fn = make_train_step(model, opt, compute_dtype=compute_dtype,
                                  mesh=mesh, donate=train_cfg.donate,
                                  augment_fn=augment_fn,
                                  label_smoothing=train_cfg.label_smoothing,
                                  grad_accum=train_cfg.grad_accum,
                                  mixup=train_cfg.mixup,
                                  cutmix=train_cfg.cutmix,
                                  distill=distill)
    if pp_mesh is not None:
        # M=1 for eval (bubble-only pipelining gains nothing there); the
        # eval step zero-pads ragged final validation batches internally
        from cnn_tpu.parallel import make_pp_eval_step
        eval_fn = make_pp_eval_step(model, pp_mesh, n_microbatches=1,
                                    compute_dtype=compute_dtype,
                                    tta=train_cfg.tta)
    else:
        eval_fn = make_eval_step(model, compute_dtype=compute_dtype,
                                 mesh=mesh, tta=train_cfg.tta)

    os.makedirs(train_cfg.checkpoint_dir, exist_ok=True)
    history = HistoryWriter(
        train_cfg.history_path
        or os.path.join(train_cfg.checkpoint_dir,
                        "history.jsonl" if is_main
                        else f"history.p{jax.process_index()}.jsonl"))
    train_eval = ClassificationEvaluator()
    mean_loss = MeanLoss()
    best_acc, best_path = -1.0, None
    timer = StepTimer()

    device_mode = device_train_ds is not None
    bs = train_cfg.train_batch_size
    chunk = train_cfg.steps_per_call if device_mode else 1
    # saves happen at validation boundaries (the checkpoint name embeds the
    # valid accuracy, cnn.cpp:121-124), so an unaligned cadence would
    # silently save every lcm(valid, save) iters — or never
    assert train_cfg.save_iters % train_cfg.valid_iters == 0, \
        f"--save-iters {train_cfg.save_iters} must be a multiple of " \
        f"--valid-iters {train_cfg.valid_iters}"
    if chunk > 1:
        # every chunk advances `chunk` iterations inside one program, so
        # the validate/save cadence, the total, and any resume point must
        # all land on chunk boundaries (nothing silently dropped)
        assert train_cfg.valid_iters % chunk == 0, \
            (train_cfg.valid_iters, chunk)
        assert train_cfg.total_iters % chunk == 0, \
            f"--total-iters {train_cfg.total_iters} must be a multiple of " \
            f"--steps-per-call {chunk}"
        assert (start_iters - 1) % chunk == 0, \
            f"resume step {start_iters - 1} must align with --steps-per-call"
    with trace(train_cfg.profile_dir or None):
        for it in range(start_iters + chunk - 1, train_cfg.total_iters + 1,
                        chunk):
            if device_mode:
                # fully on-device step(s): no host data, no per-step fetch
                # (each blocking fetch costs a ~30 ms tunnel RPC — metrics
                # are sampled at the logging cadence instead)
                ts, metrics = step_fn(ts)
                timer.tick(bs * chunk)
                # `it % 100 < chunk` fires once per crossed 100-multiple so
                # the sampling cadence survives chunk sizes that don't
                # divide 100
                if (it % 100 < chunk or it == train_cfg.total_iters
                        or it % train_cfg.valid_iters == 0):
                    mean_loss.add(float(metrics["loss"]))
                    train_eval.add_counts(int(metrics["correct"]), bs * chunk)
            else:
                images, labels = train_loader.generate_batch()
                ts, metrics = step_fn(ts, jnp.asarray(images), jnp.asarray(labels))
                mean_loss.add(float(metrics["loss"]))
                train_eval.add_counts(int(metrics["correct"]), len(labels))
                timer.tick(len(labels))

            if it % 100 < chunk or it == train_cfg.total_iters:
                print(f"\rTrain===> [batch {it}/{train_cfg.total_iters}] "
                      f"[loss {mean_loss.get():.3f}] [Accuracy {train_eval.get():.3f}] "
                      f"[{timer.images_per_sec:.1f} img/s]", end="", flush=True)

            stop_now = bool(preempted) and jax.process_count() == 1
            if (jax.process_count() > 1
                    and it % train_cfg.valid_iters == 0):
                # sync point: all processes agree to stop together
                from jax.experimental import multihost_utils
                flags = multihost_utils.process_allgather(
                    np.asarray([int(bool(preempted))], np.int32))
                stop_now = bool(np.asarray(flags).any())
            if stop_now:
                path = os.path.join(train_cfg.checkpoint_dir,
                                    f"preempt_iter_{it}.ckpt")
                if is_main:
                    save_checkpoint(path, ts)
                print(f"\npreemption signal: checkpointed step {it} to "
                      f"{path}; relaunch with --resume auto to continue")
                best_acc = -1.0   # exit fast: no final test under a reclaim deadline
                break

            if it % train_cfg.valid_iters == 0:
                print("\nvalidating...")
                eval_params = optim.ema_params(ts.opt_state)
                # EMA weights MUST pair with the EMA'd BN moving stats —
                # the raw run's stats track the current weights' activation
                # distribution, not the average's (optim.ema_update_state)
                eval_state = optim.ema_model_state(ts.opt_state, ts.state)
                if eval_params is None:
                    eval_params, eval_state = ts.params, ts.state
                if device_mode:
                    v_loss, v_acc = evaluate_device(eval_fn, eval_params,
                                                    eval_state,
                                                    device_valid_ds,
                                                    train_cfg.valid_batch_size)
                else:
                    v_loss, v_acc = evaluate(eval_fn, eval_params, eval_state,
                                             valid_loader)
                print(f"Valid===> [loss {v_loss:.3f}] [Accuracy {v_acc:.3f}]")
                # MoE router monitoring (nn/moe.py): per-expert dispatch
                # fractions from the last train step's state — the measured
                # record behind the no-balance-loss default
                moe_loads = {n: np.asarray(s["load"]).round(4).tolist()
                             for n, s in ts.state.items()
                             if isinstance(s, dict) and "load" in s}
                for n, ld in moe_loads.items():
                    print(f"MoE load [{n}]: {ld}")
                history.log(step=it, loss=mean_loss.get(),
                            accuracy=train_eval.get(), valid_loss=v_loss,
                            valid_accuracy=v_acc,
                            images_per_sec=timer.images_per_sec,
                            **({"moe_load": moe_loads} if moe_loads else {}))
                if it % train_cfg.save_iters == 0:
                    name = checkpoint_name(it, train_eval.get(), v_acc)
                    path = os.path.join(train_cfg.checkpoint_dir, name)
                    if is_main:  # one writer per shared checkpoint dir
                        save_checkpoint(path, ts)
                        print(f"weights have been saved to {path}")
                    if v_acc > best_acc:
                        best_acc, best_path = v_acc, path
                mean_loss.clear()
                train_eval.clear()
                timer.reset()

    if train_loader is not None:
        train_loader.close()
    history.close()
    print("\ntraining done!")

    # Final test. The decision to run it must be IDENTICAL on every process
    # (the jitted eval is a collective program — one process skipping it
    # would deadlock the job), so it keys on best_acc, which is computed
    # from replicated metrics. Only process 0 has the checkpoint file; in
    # multi-host runs the final state (replicated on all processes) stands
    # in for the best checkpoint, with the best path reported for later use.
    if best_acc >= 0.0:
        if jax.process_count() == 1:
            print(f"best checkpoint: {best_path} (valid acc {best_acc:.3f})")
            ts = load_checkpoint(best_path)
        else:
            print(f"best checkpoint (on process 0): {best_path} "
                  f"(valid acc {best_acc:.3f}); testing the FINAL state")
        test_loader = DataLoader(splits["test"], train_cfg.valid_batch_size,
                                 augment=False, shuffle=False,
                                 image_size=data_cfg.image_size,
                                 num_workers=data_cfg.num_workers,
                                 backend=data_cfg.backend,
                                 cache=data_cfg.cache)
        confusion = ConfusionMatrix(model_cfg.num_classes)
        test_params = optim.ema_params(ts.opt_state)
        test_state = optim.ema_model_state(ts.opt_state, ts.state)
        if test_params is None:
            test_params, test_state = ts.params, ts.state
        t_loss, t_acc = evaluate(eval_fn, test_params, test_state, test_loader,
                                 confusion)
        print(f"Test===> [loss {t_loss:.3f}] [Accuracy {t_acc:.3f}]")
        print("confusion matrix (rows = truth):")
        print(confusion.pretty(list(data_cfg.categories)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
