#!/usr/bin/env bash
# Reference-protocol-scale attribution run (VERDICT round-3 ask #5):
# 500 paired-Shapley fit subsets + 300 datamodel test subsets (the
# reference fits 500, text_to_image/shapley_convergence.py:80, and tests on
# 100 subsets x 3 seeds, shapley_lds.py:69,158-166), class-level over the
# 32-class templated+amplitude+size-ramp synthetic whose exact truth is
# guaranteed non-uniform (the _sizes knob, data/datasets.py:272-282).
# 400-step retrains in ensemble chunks; behavior = deterministic fixed-probe
# eval loss at LOW timesteps (t in [0,100)): predicting eps at near-clean
# x_t requires knowing the removed class's template, so the behavior is
# class-content-sensitive — measured on the c6 exhaustive game, the low-t
# band has 40x the truth spread of t in [100,600) (38.7% vs 0.95% relative,
# docs/groundtruth_*_summary.json). Efficiency constraint anchored on
# measured full/null models. ~1.5-2.5 h on one v5e chip at measured rates.
set -euxo pipefail

OUT=${OUT:-/tmp/refscale}
DATASET=${DATASET:-synthetic_2048x32_c32_tpl_mix_sizes}
STEPS=${STEPS:-400}
CHUNK=${CHUNK:-16}
FIT=${FIT:-500}
TEST=${TEST:-300}
mkdir -p "$OUT"

python -m group_attribution_for_diffusion_models_tpu.cli.shapley_pipeline \
  --dataset "$DATASET" --by_class \
  --fit_dist shapley_paired --num_fit_subsets "$FIT" --removal_seed 100 \
  --num_test_subsets "$TEST" --test_seed_start 5000 \
  --training_steps "$STEPS" --batch_size 64 --chunk_size "$CHUNK" \
  --behavior eval_loss --eval_t_min 0 --eval_t_max 100 \
  --outdir "$OUT" --log_freq 200 --no-save_ckpts
