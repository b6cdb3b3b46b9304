"""Benchmark: subset retrain+sample passes per hour per chip (CIFAR DDPM).

One "pass" mirrors the reference's unit of work for the unconditional
workloads: a sparsified fine-tune (200 train steps at batch 64) plus
50-image 100-step DDIM sampling per subset model, run as compiled ensemble
programs (NUM_MEMBERS CIFAR-architecture 35.7M-param U-Nets, reference
src/ddpm_config.py:48-100) on one chip. The train loop is a lax.scan on
device (EnsembleTrainer.run_scanned).

vs_baseline is a LIKE-FOR-LIKE derived reference throughput, not the SD
number. The reference's only measured wall time is 646 s/subset for the
sparse-GD recipe on the miniSD LoRA workload (BASELINE.md:13). Its CIFAR
equivalent is derived by FLOPs scaling with XLA cost analysis of the two
U-Nets (this repo, single-image forward):

    miniSD U-Net fwd   164.49 GFLOP/image   (860M params, 32x32x4 latents)
    CIFAR U-Net fwd     11.72 GFLOP/image   (35.7M params, 32x32x3)

    SD pass    = 200*64*3 + 50*100 fwd-equivalents = 43,400 * C_sd
    CIFAR pass = 200*64*3 + 50*100 fwd-equivalents = 43,400 * C_cifar
    ref CIFAR-pass time = 646 s * C_cifar / C_sd = 46.0 s
    => BASELINE_PASSES_PER_HOUR = 3600 / 46.0 = 78.2

This assumes the reference stack would be equally efficient on the small
model as on miniSD — generous to the reference, since small models are more
dispatch-bound on GPU. The SD workload itself is benchmarked apples-to-apples
by bench_sd.py (same 646 s denominator, same model class).

Output: one JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

# Env-overridable for member-count sweeps; the driver's defaults are the
# recorded configuration.
NUM_MEMBERS = int(os.environ.get("BENCH_MEMBERS", "8"))
TRAIN_STEPS = 200
BATCH = 64
N_SAMPLES = 50
SAMPLE_STEPS = 100
# Derived like-for-like reference throughput for this workload (see module
# docstring): 646 s * (11.72 / 164.49) = 46.0 s/pass.
BASELINE_PASSES_PER_HOUR = 78.2


def _probe_backend(timeout_s: float = 300.0):
    """Fail fast (clear JSON diagnostic + exit 1) if the TPU backend is
    unreachable, instead of hanging until an external timeout kills the
    bench with no output. jax.devices() blocks indefinitely when the
    remote-relay backend is down, so probe it from a daemon thread."""
    import threading

    result = {}

    def probe():
        import jax

        result["devices"] = [str(d) for d in jax.devices()]

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in result:
        print(
            json.dumps(
                {
                    "metric": "subset_retrain_sample_passes_per_hour_per_chip",
                    "value": 0,
                    "unit": "passes/hour/chip",
                    "vs_baseline": 0,
                    "error": f"accelerator backend unreachable "
                    f"(jax.devices() did not return within {timeout_s:.0f}s)",
                }
            )
        )
        raise SystemExit(1)


def main():
    _probe_backend()

    from group_attribution_for_diffusion_models_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

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
    # BENCH_OPT_FLAT=1 opts into the flattened optimizer
    # (make_optimizer(flat=)). MEASURED ON-CHIP AND DEFAULTED OFF: flat
    # regressed this bench 701.8 -> 645.3 passes/h (train 36.9 -> 40.6 s)
    # — optax.flatten's per-step gather/scatter of ~130 leaves into one
    # vector costs more HBM traffic than the per-leaf kernel overhead it
    # removes at this 35.7M x 8-member scale.
    tx = make_optimizer(
        "adam", lr=1e-4, flat=os.environ.get("BENCH_OPT_FLAT", "0") == "1"
    )
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

    # Warm up the compiles outside the timed region (the scanned loop runs
    # with fresh per-step keys inside, so the relay's execution memoization
    # cannot short-circuit the timed run).
    state, _ = trainer.run_scanned(state, TRAIN_STEPS, seed=99)
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
    state, metrics = trainer.run_scanned(state, TRAIN_STEPS, seed=0)
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
                    "workload": "cifar_ddpm_35.7M",
                    "baseline_derivation": "646s SD sparse-gd pass scaled by "
                    "fwd-FLOPs ratio 11.72/164.49 => 46.0s => 78.2 passes/h",
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
