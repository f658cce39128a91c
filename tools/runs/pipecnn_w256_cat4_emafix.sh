#!/usr/bin/env bash
# VERDICT r4 item 5, headline run: identical config to pipecnn_w256_cat4.sh
# but with the EMA<->BN-stats pairing fix (optim.ema_update_state) in the
# train step — the first run is the measured "EMA evaluated against raw
# stats" A/B baseline (test 0.853), this one is the headline row.
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
  --checkpoint-dir checkpoints/pipecnn_w256_cat4_emafix
