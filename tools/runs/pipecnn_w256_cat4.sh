#!/usr/bin/env bash
# VERDICT r4 item 5: one REAL training run at the high-MFU shape.
# pipecnn w256 L8 (remat='conv'), 4-class (incl. cat), full augmentation
# policy, device-resident dataset, bf16 — the exact configuration the
# 62%-MFU synthetic benches measure, now accuracy-bearing.
cd /root/repo
exec python -u -m cnn_tpu.tools.train \
  --name pipecnn --width 256 --n-blocks 8 --batch-norm true \
  --categories dog,panda,bird,cat --num-classes 4 \
  --device-dataset true --augment true --augment-mode full \
  --compute-dtype bfloat16 \
  --train-batch-size 256 --total-iters 12000 \
  --valid-iters 500 --save-iters 1000 \
  --optimizer momentum --lr-schedule cosine --learning-rate 1.5e-2 \
  --warmup-steps 500 --ema 0.999 \
  --compile-cache /root/repo/.jax_cache \
  --checkpoint-dir checkpoints/pipecnn_w256_cat4
