#!/usr/bin/env bash
# VERDICT r5 item 5: point distillation at the hardest split. Student
# resnet10 (the 4-class accuracy holder), teachers = the ensemble of the
# two best 4-class runs from DIFFERENT families (resnet10 r3b 0.885/0.887
# + pipecnn w256 mixup 0.823/0.870 — likely-decorrelated errors), with the
# T=3 alpha=0.3 recipe that gained +0.027 test on 3-class. r3b recipe
# otherwise (cosine peak 2e-2, warmup 500), EMA OFF (measured: EMA tracks
# the over-softened trajectory when KD already softens the loss).
cd /root/repo
exec python -u -m cnn_tpu.tools.train \
  --name resnet10 --batch-norm true \
  --categories dog,panda,bird,cat --num-classes 4 \
  --device-dataset true --augment true --augment-mode full \
  --compute-dtype bfloat16 \
  --train-batch-size 256 --total-iters 40000 \
  --valid-iters 1000 --save-iters 1000 \
  --optimizer momentum --lr-schedule cosine --learning-rate 2e-2 \
  --warmup-steps 500 \
  --distill-from checkpoints/resnet10_cat4_r3b/iter_30000_train_0.996_valid_0.885.ckpt,checkpoints/pipecnn_w256_cat4_mixup/iter_11000_train_0.692_valid_0.823.ckpt \
  --distill-model resnet10,pipecnn@width=256@n_blocks=8 \
  --distill-temp 3.0 --distill-alpha 0.3 \
  --compile-cache /root/repo/.jax_cache \
  --checkpoint-dir checkpoints/resnet10_cat4_distill_ens
