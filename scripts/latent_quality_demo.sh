#!/usr/bin/env bash
# Latent-space attribution-quality demo (the celeba-style LDM workload).
#
# Round-2 finding (ROADMAP.md): amplitude-class signal (`_mix`) does not
# survive ANY GroupNorm conv encoder — random or trained — so latent-space
# LDS on `_mix_ldm` is ~0 by construction, not by pipeline defect. Spatial
# TEMPLATE classes (`_tpl`) are the signal that survives an encoder: class k
# concentrates on a fixed template image, and a VQ-VAE must reproduce those
# templates to reconstruct the data at all.
#
# This script (1) trains a small VQ-VAE on the templated synthetic on-chip,
# (2) runs the one-command Shapley estimation pipeline in that VQ's latent
# space, reporting LDS against held-out datamodel subsets with measured
# full/null anchors. Expected wall: ~1.5 h on one v5e chip.
#
# Reference counterparts: unconditional_generation/main.py (celeba latent
# training via precomputed VQ latents) + lds.py; the pipeline replaces the
# SLURM array with the mesh ensemble axis.
set -euxo pipefail

OUT=${OUT:-/tmp/latent_tpl_demo}
DATASET=${DATASET:-synthetic_2048x32_tpl_mix}
FIT=${FIT:-64}
TEST=${TEST:-24}
STEPS=${STEPS:-800}
FIT_DIST=${FIT_DIST:-shapley_paired}
VQ_STEPS=${VQ_STEPS:-3000}
mkdir -p "$OUT"

VQW="$OUT/vqvae_weights.npy"
if [ ! -f "$VQW" ]; then
  python -m group_attribution_for_diffusion_models_tpu.cli.train_vqvae \
    --dataset "${DATASET}_ldm" --outdir "$OUT/vqvae" --weights_out "$VQW" \
    --training_steps "$VQ_STEPS" --batch_size 64
fi

python -m group_attribution_for_diffusion_models_tpu.cli.shapley_pipeline \
  --dataset "${DATASET}_ldm" --behavior eval_loss --by_class \
  --num_fit_subsets "$FIT" --num_test_subsets "$TEST" \
  --fit_dist "$FIT_DIST" \
  --training_steps "$STEPS" --batch_size 64 --chunk_size 16 --log_freq 100 \
  --vqvae_weights "$VQW" --outdir "$OUT"
