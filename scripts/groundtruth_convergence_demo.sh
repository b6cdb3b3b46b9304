#!/usr/bin/env bash
# Ground-truth Shapley convergence demo: exact attribution values from
# EXHAUSTIVE subset retraining, then KernelSHAP estimate quality at
# increasing fit-subset counts — the on-chip analog of the reference's
# empirical_verification.ipynb cell 4 (Pearson vs ground truth,
# CIFAR 0.763->0.953) with a real exact game instead of a pseudo-truth.
#
# 8 classes -> 255 non-empty subsets, every one retrained on the ensemble
# axis (chunks of CHUNK members per compiled program) + the untrained null
# anchor. The estimate sweep reuses the enumerated values by lookup, so it
# is free. Expected wall: well under an hour on one v5e chip.
set -euxo pipefail

OUT=${OUT:-/tmp/groundtruth_demo}
DATASET=${DATASET:-synthetic_1024x32_c8_tpl_mix_big}
STEPS=${STEPS:-400}
CHUNK=${CHUNK:-32}
FIT_COUNTS=${FIT_COUNTS:-10,24,50,100,200}
mkdir -p "$OUT"

python -m group_attribution_for_diffusion_models_tpu.cli.shapley_groundtruth \
  --dataset "$DATASET" --training_steps "$STEPS" --chunk_size "$CHUNK" \
  --eval_t_min 100 --eval_t_max 600 --log_freq 100 \
  --fit_counts "$FIT_COUNTS" --outdir "$OUT"
