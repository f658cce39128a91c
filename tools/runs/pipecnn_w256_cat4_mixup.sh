#!/usr/bin/env bash
# Round-4 accuracy attempt at the high-MFU shape: the emafix run overfits
# hard (train 1.000 by 9k, valid peaks 0.800 @8k then drifts), so add the
# one strong regularizer the 4-class ablations never tried — MixUp — and
# stretch the cosine schedule to 20k. Label smoothing / weight decay stay
# OFF (measured harmful on this split, BASELINE.md §r3 "second attempt").
cd /root/repo
exec python -u -m cnn_tpu.tools.train \
  --name pipecnn --width 256 --n-blocks 8 --batch-norm true \
  --categories dog,panda,bird,cat --num-classes 4 \
  --device-dataset true --augment true --augment-mode full \
  --compute-dtype bfloat16 --mixup 0.2 \
  --train-batch-size 256 --total-iters 20000 \
  --valid-iters 500 --save-iters 1000 \
  --optimizer momentum --lr-schedule cosine --learning-rate 1.5e-2 \
  --warmup-steps 500 --ema 0.999 \
  --compile-cache /root/repo/.jax_cache \
  --checkpoint-dir checkpoints/pipecnn_w256_cat4_mixup
