#!/usr/bin/env bash
# Protocol-scale pipeline with a GENERATED-SAMPLE behavior (VERDICT r4 ask
# #2): every member pays the sampling + Inception-scoring cost inside the
# loop — the 383.4 s/pass inference share of the reference's 646 s subset
# pass (BASELINE.md; reference unconditional_generation/
# calculate_global_scores.py:160-482) that eval_loss-only runs skip. The
# resulting subset-passes/hour is cost-comparable to the reference's
# number; quote it NEXT TO the eval_loss-only figure, not instead of it.
#
# 200 fit / 100 test subsets, class-level, --behavior fid_value with 50
# DDIM-sampled images per member scored against cached training-set
# Inception statistics.
set -euxo pipefail

OUT=${OUT:-/tmp/refscale_fid}
DATASET=${DATASET:-synthetic_2048x32_c32_tpl_mix_sizes}
STEPS=${STEPS:-300}
CHUNK=${CHUNK:-16}
FIT=${FIT:-200}
TEST=${TEST:-100}
NSAMP=${NSAMP:-50}
INFER=${INFER:-100}
mkdir -p "$OUT"

python -m group_attribution_for_diffusion_models_tpu.cli.shapley_pipeline \
  --dataset "$DATASET" --by_class \
  --fit_dist shapley_paired --num_fit_subsets "$FIT" --removal_seed 100 \
  --num_test_subsets "$TEST" --test_seed_start 5000 \
  --training_steps "$STEPS" --batch_size 64 --chunk_size "$CHUNK" \
  --behavior fid_value --n_samples "$NSAMP" --num_inference_steps "$INFER" \
  --outdir "$OUT" --log_freq 200 --no-save_ckpts \
  --exp_name refscale_fid_pipeline
