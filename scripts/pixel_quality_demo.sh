#!/usr/bin/env bash
# Pixel-space attribution-quality demo on the templated heterogeneous
# synthetic (class k = fixed spatial template + class-amplitude ramp —
# the synthetic analog of CIFAR class structure; see
# data/datasets.py::make_synthetic).
#
# One command runs the whole Shapley estimation loop on-chip: class-level
# Shapley fit subsets + held-out datamodel test subsets as mesh-ensemble
# retrains, deterministic probe-loss behaviors, measured full/null
# efficiency-constraint anchors, Spearman LDS. Measured round 2 (v5e):
# LDS = +31.2 at FIT=32/TEST=16 in ~77 min; 16-member ensemble batches take
# ~217 s each after the first compile, so FIT=128 adds ~35 min.
#
# Reference counterparts: unconditional_generation/main.py retrain sweep
# (SLURM array) + lds.py; fit-subset counts follow shapley_convergence.py:80
# (reference uses up to 500).
set -euxo pipefail

OUT=${OUT:-/tmp/pixel_tpl_demo}
DATASET=${DATASET:-synthetic_2048x32_tpl_mix_big}
FIT=${FIT:-128}
TEST=${TEST:-24}
STEPS=${STEPS:-800}
FIT_DIST=${FIT_DIST:-shapley_paired}
mkdir -p "$OUT"

python -m group_attribution_for_diffusion_models_tpu.cli.shapley_pipeline \
  --dataset "$DATASET" --by_class \
  --num_fit_subsets "$FIT" --num_test_subsets "$TEST" \
  --fit_dist "$FIT_DIST" \
  --training_steps "$STEPS" --batch_size 64 \
  --behavior eval_loss --eval_t_min 100 --eval_t_max 600 \
  --chunk_size 16 --log_freq 50 --outdir "$OUT"
