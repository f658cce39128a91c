#!/usr/bin/env bash
# Post-run evaluation for the 4-class ensemble-distilled resnet10
# (tools/runs/resnet10_cat4_distill_ens.sh). Usage:
#   tools/runs/eval_distill_ens.sh <best_ckpt>
# Reports valid/test with and without TTA hflip, plus the
# student+teacher probability ensemble (eval-only, same splits).
set -euo pipefail
cd "$(dirname "$0")/../.."
CKPT="$1"
COMMON=(--categories dog,panda,bird,cat --num-classes 4
        --compute-dtype bfloat16 --compile-cache /root/repo/.jax_cache
        --split both)

echo "=== distilled student, no TTA ==="
python -u -m cnn_tpu.tools.evaluate --resume "$CKPT" --name resnet10 "${COMMON[@]}"

echo "=== distilled student, TTA hflip ==="
python -u -m cnn_tpu.tools.evaluate --resume "$CKPT" --name resnet10 \
    --tta hflip "${COMMON[@]}"

echo "=== student + resnet10 teacher ensemble, TTA hflip ==="
python -u -m cnn_tpu.tools.evaluate \
    --ensemble "resnet10:$CKPT,resnet10:checkpoints/resnet10_cat4_r3b/iter_30000_train_0.996_valid_0.885.ckpt" \
    --tta hflip "${COMMON[@]}"

echo "=== student + both teachers (3-way, shaped member), TTA hflip ==="
python -u -m cnn_tpu.tools.evaluate \
    --ensemble "resnet10:$CKPT,resnet10:checkpoints/resnet10_cat4_r3b/iter_30000_train_0.996_valid_0.885.ckpt,pipecnn@width=256@n_blocks=8:checkpoints/pipecnn_w256_cat4_mixup/iter_11000_train_0.692_valid_0.823.ckpt" \
    --tta hflip "${COMMON[@]}"
