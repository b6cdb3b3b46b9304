"""Command-line entry points.

Every CLI here gets the persistent XLA compilation cache: retrain sweeps
and quality demos re-run near-identical compiled programs across many
processes (the reference pays this as per-process torch warmup), so a
shared on-disk cache removes all but the first compile.
"""

from group_attribution_for_diffusion_models_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()
