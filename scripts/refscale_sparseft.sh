#!/usr/bin/env bash
# The paper's central comparison at protocol scale (VERDICT r4 ask #3):
# sparse fine-tuning fits vs retrain ground truth. Reference
# text_to_image/shapley_lds.py:228-283 fits baseline-retrain and
# method-sparse_gd side by side against the same retrained test rows and
# reports both LDS plus the cost ratio; src/ddpm_config.py:656-672 gives
# sparse-gd a ~5x smaller step budget than retraining.
#
# This script reuses the protocol-scale DB from refscale_attribution.sh
# (500 paired-Shapley retrain fits + 300 datamodel retrain tests, 300-step
# retrains): it prunes the recorded full model (diff-pruning importance,
# reference prune.py:358-378), then runs the SAME 500 fit subsets as
# prune_fine_tune members fine-tuned from the shared pruned base for
# SPARSE_STEPS steps each. The 300 retrain test rows and the question
# "does the cheap fit family reproduce the expensive one's LDS?" are
# identical to the reference's table.
set -euxo pipefail

OUT=${OUT:-/tmp/refscale}
DATASET=${DATASET:-synthetic_2048x32_c32_tpl_mix_sizes}
STEPS=${STEPS:-300}          # retrain budget (must match the recorded DB)
SPARSE_STEPS=${SPARSE_STEPS:-100}
RATIO=${RATIO:-0.3}
CHUNK=${CHUNK:-16}
FIT=${FIT:-500}
TEST=${TEST:-300}

FULL="$OUT/$DATASET/retrain/models/full"
test -d "$FULL"

# 1) structural pruning of the recorded full model.
if [ ! -d "$OUT/$DATASET/prune/models/full" ]; then
  python -m group_attribution_for_diffusion_models_tpu.cli.prune \
    --dataset "$DATASET" --load "$FULL" --pruning_ratio "$RATIO" \
    --pruner diff-pruning --timestep_stride 10 --outdir "$OUT"
fi

# 2) sparse-FT fit subsets against the existing retrain test DB. Test
# subsets + anchors are idempotent-skipped where rows already exist.
python -m group_attribution_for_diffusion_models_tpu.cli.shapley_pipeline \
  --dataset "$DATASET" --by_class \
  --method prune_fine_tune --load "$OUT/$DATASET/prune/models/full" \
  --fit_dist shapley_paired --num_fit_subsets "$FIT" --removal_seed 100 \
  --num_test_subsets "$TEST" --test_seed_start 5000 \
  --training_steps "$STEPS" --fit_training_steps "$SPARSE_STEPS" \
  --batch_size 64 --chunk_size "$CHUNK" \
  --behavior eval_loss --eval_t_min 0 --eval_t_max 100 \
  --outdir "$OUT" --log_freq 200 --no-save_ckpts \
  --exp_name sparseft_pipeline
