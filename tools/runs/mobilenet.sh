#!/usr/bin/env bash
# VERDICT r5 item 2: MobileNet's first trained run — the depthwise family
# measured to the same standard as the other six (accuracy + img/s row in
# BASELINE.md). Recipe = the moecnn family row's (full policy, bf16,
# momentum+cosine, 15k x 256) so the number is comparable across families.
cd /root/repo
exec python -u -m cnn_tpu.tools.train \
  --name mobilenet --batch-norm true \
  --device-dataset true --augment true --augment-mode full \
  --compute-dtype bfloat16 \
  --train-batch-size 256 --total-iters 15000 \
  --valid-iters 1000 --save-iters 1000 \
  --optimizer momentum --lr-schedule cosine --learning-rate 1.5e-2 \
  --warmup-steps 500 \
  --compile-cache /root/repo/.jax_cache \
  --checkpoint-dir checkpoints/mobilenet
