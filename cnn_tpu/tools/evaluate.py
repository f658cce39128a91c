"""Standalone checkpoint evaluation CLI.

``python -m cnn_tpu.tools.evaluate --resume <ckpt> [--split test|valid|both]
[--tta hflip|flips] ...`` — loads a native ``.ckpt`` (EMA-aware: evaluates
the averaged weights when the checkpoint carries them) and reports loss /
accuracy / confusion matrix over the requested split(s) of the reference
dataset layout.

Superset: the reference has no eval-only entry point — its test pass is
welded to the end of training (``/root/reference/cpu/src/cnn.cpp:100-110``)
and its inference binary classifies single images only
(``inference.cpp:53-72``). This CLI also hosts test-time augmentation
(``--tta``), which the train CLI shares via ``make_eval_step``.
"""

from __future__ import annotations

import os
import sys

import jax

from cnn_tpu.core.config import parse_configs
from cnn_tpu import optim
from cnn_tpu.data import DataLoader, discover_dataset, split_dataset
from cnn_tpu.models import get_model
from cnn_tpu.parallel import make_eval_step
from cnn_tpu.utils.checkpoint import load_checkpoint
from cnn_tpu.utils.metrics import ConfusionMatrix


def main(argv=None):
    import argparse
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--split", default="both", choices=("valid", "test", "both"))
    pre.add_argument("--ensemble", default="",
                     help="name:ckpt[,name:ckpt...] — average class "
                          "probabilities across models (mixed families ok); "
                          "replaces --resume/--name")
    pre_ns, rest = pre.parse_known_args(argv if argv is not None
                                        else sys.argv[1:])
    model_cfg, data_cfg, train_cfg, _ = parse_configs(rest, "cnn_tpu evaluate")
    if not pre_ns.ensemble and (not train_cfg.resume
                                or not os.path.exists(train_cfg.resume)):
        print(f"--resume must point at a checkpoint (got '{train_cfg.resume}')",
              file=sys.stderr)
        return 2

    if train_cfg.compile_cache:
        os.makedirs(train_cfg.compile_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", train_cfg.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    samples = discover_dataset(data_cfg.dataset_path, data_cfg.categories)
    splits = split_dataset(samples, data_cfg.train_ratio, data_cfg.test_ratio,
                           data_cfg.split_seed)

    import jax.numpy as jnp
    compute_dtype = (jnp.bfloat16 if model_cfg.compute_dtype == "bfloat16"
                     else None)

    def load_params(path):
        ts = load_checkpoint(path)
        p = optim.ema_params(ts.opt_state)
        if p is not None:
            print(f"{path}: evaluating the EMA-averaged weights")
            # pair with the EMA'd BN stats (optim.ema_update_state);
            # legacy checkpoints without them fall back to the raw state
            return p, optim.ema_model_state(ts.opt_state, ts.state)
        return ts.params, ts.state

    from cnn_tpu.utils.checkpoint import tree_has_bn

    if pre_ns.ensemble:
        from cnn_tpu.parallel import make_ensemble_eval_step
        models, params, state = [], [], []
        for spec in pre_ns.ensemble.split(","):
            name, _, ck = spec.partition(":")
            assert ck, f"--ensemble spec '{spec}' must be name[@k=v...]:ckpt"
            # shaped members (pipecnn@width=256@n_blocks=8:ckpt) — same
            # syntax as the train CLI's --distill-model, so any teacher
            # ensemble used for distillation can also be evaluated directly
            name, *kvs = name.split("@")
            kwargs = {}
            for kv in kvs:
                k, v = kv.split("=", 1)
                kwargs[k.replace("-", "_")] = (
                    int(v) if v.lstrip("-").isdigit() else float(v))
            p, s = load_params(ck)
            # BN-ness is a property of each member's CHECKPOINT, not of a
            # shared CLI flag: a BN param tree loaded into a BN-free model
            # would silently drop the bn_* subtrees (Sequential ignores
            # unknown keys) and evaluate garbage
            models.append(get_model(name, num_classes=model_cfg.num_classes,
                                    image_size=model_cfg.image_size,
                                    batch_norm=tree_has_bn(p), **kwargs))
            params.append(p)
            state.append(s)
        eval_fn = make_ensemble_eval_step(models, compute_dtype=compute_dtype,
                                          tta=train_cfg.tta)
        print(f"ensemble of {len(models)} models"
              + (f", TTA {train_cfg.tta}" if train_cfg.tta else ""))
    else:
        params, state = load_params(train_cfg.resume)
        # same auto-detection as the ensemble branch: the checkpoint wins
        # over the --batch-norm flag (which defaults false)
        model = get_model(model_cfg.name, num_classes=model_cfg.num_classes,
                          image_size=model_cfg.image_size,
                          batch_norm=tree_has_bn(params),
                          dropout=model_cfg.dropout)
        eval_fn = make_eval_step(model, compute_dtype=compute_dtype,
                                 tta=train_cfg.tta)
        if train_cfg.tta:
            print(f"test-time augmentation: {train_cfg.tta}")

    from cnn_tpu.tools.train import evaluate
    want = ("valid", "test") if pre_ns.split == "both" else (pre_ns.split,)
    for split in want:
        loader = DataLoader(splits[split], train_cfg.valid_batch_size,
                            augment=False, shuffle=False,
                            image_size=data_cfg.image_size,
                            num_workers=data_cfg.num_workers,
                            backend=data_cfg.backend, cache=data_cfg.cache)
        confusion = ConfusionMatrix(model_cfg.num_classes)
        loss, acc = evaluate(eval_fn, params, state, loader, confusion)
        print(f"{split.capitalize()}===> [loss {loss:.3f}] [Accuracy {acc:.3f}]")
        print("confusion matrix (rows = truth):")
        print(confusion.pretty(list(data_cfg.categories)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
