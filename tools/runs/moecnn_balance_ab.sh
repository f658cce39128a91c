#!/usr/bin/env bash
# VERDICT r4 item 9: measure the MoE no-balance-loss choice.
# Two identical moecnn runs differing only in --moe-balance; per-expert
# load fractions land in each history.jsonl at every validation.
cd /root/repo
set -e
for coeff in 0.0 0.01; do
  dir=checkpoints/moecnn_balance_${coeff}
  python -u -m cnn_tpu.tools.train \
    --name moecnn --batch-norm true --moe-balance ${coeff} \
    --device-dataset true --augment true --augment-mode full \
    --compute-dtype bfloat16 \
    --train-batch-size 256 --total-iters 15000 \
    --valid-iters 1000 --save-iters 15000 \
    --optimizer momentum --lr-schedule cosine --learning-rate 1.5e-2 \
    --warmup-steps 500 \
    --compile-cache /root/repo/.jax_cache \
    --checkpoint-dir ${dir}
done
