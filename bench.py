"""Benchmark: subset retrain+sample passes per hour per chip.

The reference's unit of work — one Shapley subset pass — is a sparsified
fine-tune (200 train steps) plus sample generation for behavior scoring,
at a median 646 s/subset on an RTX 6000 (~5.6 passes/hour/GPU; BASELINE.md).

This benchmark runs the same shape of work TPU-native: an ensemble of
NUM_MEMBERS CIFAR-architecture DDPM U-Nets (reference src/ddpm_config.py:
48-100, 35.7M params each) trained subset-parallel for TRAIN_STEPS steps at
batch BATCH (the sparse-FT budget), then 100-step DDIM sampling of N_SAMPLES
images per member — all as compiled ensemble programs on one chip. Reported
metric: completed subset passes per hour per chip; vs_baseline is the ratio
to the reference's 5.6/h.

Output: one JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

NUM_MEMBERS = 8
TRAIN_STEPS = 200
BATCH = 64
N_SAMPLES = 16
SAMPLE_STEPS = 100
BASELINE_PASSES_PER_HOUR = 5.6  # BASELINE.md: 646 s/subset on RTX 6000


def main():
    import jax
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.config import get_config
    from group_attribution_for_diffusion_models_tpu.data import (
        make_synthetic,
        sample_removal,
    )
    from group_attribution_for_diffusion_models_tpu.diffusion import make_schedule
    from group_attribution_for_diffusion_models_tpu.diffusion.sampling import (
        sample_loop,
    )
    from group_attribution_for_diffusion_models_tpu.models import UNet2D
    from group_attribution_for_diffusion_models_tpu.parallel import EnsembleTrainer
    from group_attribution_for_diffusion_models_tpu.training import make_optimizer

    cfg = get_config("cifar")
    # remat off: the 8x64 config fits HBM without it and runs ~12% faster
    # (measured on v5e: 220 vs 249 ms/step).
    model = UNet2D(cfg.unet, dtype=jnp.bfloat16, remat=False)
    spec = cfg.scheduler
    schedule = make_schedule(spec)

    n = 2048
    ds = make_synthetic(n=n, size=32)
    images_u8 = ((ds.images + 1.0) * 127.5).astype(np.uint8)
    member_idx = [
        sample_removal("shapley", n, seed=s)[0] for s in range(NUM_MEMBERS)
    ]
    tx = make_optimizer("adam", lr=1e-4)
    trainer = EnsembleTrainer(
        apply_fn=model.apply,
        tx=tx,
        schedule=schedule,
        spec=spec,
        images_u8=images_u8,
        member_indices=member_idx,
        batch_size=BATCH,
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    state = trainer.init_state(params=params)

    # Warm up the compiles outside the timed region.
    state, _ = trainer.step(state, jax.random.PRNGKey(-1))
    jax.block_until_ready(state)

    sample_shape = (N_SAMPLES, 32, 32, 3)

    @jax.jit
    def ensemble_sample(stacked_params, key):
        keys = jax.random.split(key, NUM_MEMBERS)
        return jax.vmap(
            lambda p, k: sample_loop(
                model.apply, p, schedule, spec, sample_shape, k,
                num_inference_steps=SAMPLE_STEPS, kind="ddim",
            )
        )(stacked_params, keys)

    imgs = ensemble_sample(state.ema_params, jax.random.PRNGKey(-2))
    jax.block_until_ready(imgs)

    t0 = time.time()
    for i in range(TRAIN_STEPS):
        state, metrics = trainer.step(state, jax.random.PRNGKey(i))
    jax.block_until_ready(state)
    train_s = time.time() - t0

    t0 = time.time()
    imgs = ensemble_sample(state.ema_params, jax.random.PRNGKey(123))
    jax.block_until_ready(imgs)
    sample_s = time.time() - t0

    total_s = train_s + sample_s
    passes_per_hour = NUM_MEMBERS / (total_s / 3600.0)
    print(
        json.dumps(
            {
                "metric": "subset_retrain_sample_passes_per_hour_per_chip",
                "value": round(passes_per_hour, 2),
                "unit": "passes/hour/chip",
                "vs_baseline": round(passes_per_hour / BASELINE_PASSES_PER_HOUR, 2),
                "detail": {
                    "num_members": NUM_MEMBERS,
                    "train_steps": TRAIN_STEPS,
                    "batch": BATCH,
                    "n_samples": N_SAMPLES,
                    "sample_steps": SAMPLE_STEPS,
                    "train_s": round(train_s, 2),
                    "sample_s": round(sample_s, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
