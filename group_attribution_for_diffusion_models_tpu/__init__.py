"""TPU-native framework for crediting data contributors of diffusion models.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
q8888620002/Group-Attribution-for-Diffusion-Models (ICLR'25, arXiv 2407.03153):
attributing global properties of diffusion models (FID/IS, diversity entropy,
aesthetic quality) to groups of training-data contributors via Shapley values
estimated by retraining (or sparsified fine-tuning) on data subsets.

Key architectural departures from the reference (PyTorch/CUDA/SLURM):

* All model compute (U-Net forward/backward, DDIM/DDPM sampling, scoring
  towers) is pure-functional JAX, jitted and laid out for the TPU MXU
  (NHWC convs, bf16-friendly matmuls, `lax.scan` sampling loops).
* The reference's SLURM-array "one process per removal seed" loop becomes a
  first-class **ensemble axis**: `vmap`/`shard_map` over stacked per-subset
  parameters so hundreds of subset retrains run as one compiled program on a
  device mesh (see `parallel.ensemble`).
* The CUDA JL projection (trak/fast-jl) becomes a Pallas kernel that streams
  seeded projection tiles through VMEM without materializing the projection
  matrix (see `ops.jl_projection`).
* Structural pruning is a config+params transformation (shape-changing pytree
  map), never a pickled module (see `pruning`).

Import as::

    import group_attribution_for_diffusion_models_tpu as gadm
"""

__version__ = "0.1.0"
