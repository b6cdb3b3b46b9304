"""SD-workload benchmark: miniSD-architecture LoRA subset passes per hour.

Apples-to-apples with the reference's headline efficiency numbers
(BASELINE.md): one subset pass = 200 LoRA fine-tuning steps at batch 64 on
the miniSD U-Net (SD 1.x at 256px -> 32x32 latents, rank-256 LoRA) plus
50-image 100-step DDIM sampling — the sparse-gd recipe the reference times
at 646 s/subset on an RTX 6000 (~5.6 passes/hour/GPU).

Here NUM_MEMBERS subset LoRAs train as one vmapped program over a frozen
bf16 base; caption embeddings and latents are precomputed, so the hot loop
is U-Net-only. Emits one JSON line like bench.py.

Run separately from bench.py (the default driver bench): the first compile
of the 860M-param vmapped program through this image's remote-compile relay
can take tens of minutes.

Measured on one TPU v5e (reference: 646 s/subset => 5.57 passes/hour):

    members x batch   passes/hour   vs reference
    1 x 64 (exact)        40.25          7.2x
    2 x 32                73.49         13.2x   (with the Pallas flash kernel)
    4 x 16               125.84         22.6x

Train time is nearly flat in member count (80 s for 200 steps at all three
configs): at these batch sizes the step is bandwidth/latency-bound, so extra
ensemble members ride almost free until HBM runs out (2 x 64 needs 22.5 GB).
"""

import functools
import json
import time

import numpy as np

NUM_MEMBERS = 2
TRAIN_STEPS = 200
BATCH = 32
N_SAMPLE_IMAGES = 50
SAMPLE_STEPS = 100
RANK = 256
BASELINE_PASSES_PER_HOUR = 3600.0 / 646.0  # reference sparse-gd total


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from group_attribution_for_diffusion_models_tpu.config.registry import (
        MINISD_SCHEDULER,
        MINISD_UNET,
    )
    from group_attribution_for_diffusion_models_tpu.data import sample_removal
    from group_attribution_for_diffusion_models_tpu.diffusion import make_schedule
    from group_attribution_for_diffusion_models_tpu.diffusion.sampling import (
        sample_loop,
    )
    from group_attribution_for_diffusion_models_tpu.diffusion.schedulers import (
        add_noise,
    )
    from group_attribution_for_diffusion_models_tpu.models import UNet2D
    from group_attribution_for_diffusion_models_tpu.models.lora import (
        lora_init,
        lora_merge,
    )
    from group_attribution_for_diffusion_models_tpu.parallel.ensemble import (
        pad_member_indices,
    )
    from group_attribution_for_diffusion_models_tpu.training import make_optimizer

    spec = MINISD_UNET
    sched_spec = MINISD_SCHEDULER
    schedule = make_schedule(sched_spec)
    model = UNet2D(spec, dtype=jnp.bfloat16, remat=True)

    size, ch = spec.sample_size, spec.in_channels
    base_params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, ch)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, spec.cross_attention_dim)),
    )["params"]
    base_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), base_params
    )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(base_params))

    # Synthetic latent dataset + per-member subsets (ArtBench-scale: 5000
    # images, 258 artist groups).
    n_data = 5000
    rng = np.random.RandomState(0)
    latents = jnp.asarray(rng.normal(size=(n_data, size, size, ch)).astype(np.float32))
    ehs = jnp.asarray(rng.normal(size=(1, 77, spec.cross_attention_dim)).astype(np.float32))
    member_idx = [
        sample_removal("shapley", n_data, seed=s)[0] for s in range(NUM_MEMBERS)
    ]
    table, sizes = pad_member_indices(member_idx)
    table_j, sizes_j = jnp.asarray(table), jnp.asarray(sizes)

    trees = [
        lora_init(base_params, rank=RANK, key=jax.random.PRNGKey(100 + s))
        for s in range(NUM_MEMBERS)
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)
    n_lora = sum(p.size for p in jax.tree_util.tree_leaves(trees[0]))
    tx = make_optimizer("adamw", lr=3e-4, lr_schedule="cosine",
                        total_steps=TRAIN_STEPS)
    opt_state = jax.vmap(tx.init)(stacked)

    # base/latents/ehs enter as jit ARGUMENTS: closure-captured arrays embed
    # as constants in the serialized HLO and blow the compile-service payload
    # (the 860M base alone is 1.7 GB of constants).
    def member_step(base, lat_all, ehs_b, lora, opt_st, table_row, msize, key):
        k_idx, k_t, k_n = jax.random.split(key, 3)
        slot = jax.random.randint(k_idx, (BATCH,), 0, msize)
        lat = lat_all[table_row[slot]]
        t = jax.random.randint(k_t, (BATCH,), 0, sched_spec.num_train_timesteps)
        noise = jax.random.normal(k_n, lat.shape)

        def loss_fn(lo):
            merged = lora_merge(base, lo)
            x_t = add_noise(schedule, lat, noise, t)
            eps = model.apply({"params": merged}, x_t, t, ehs_b)
            return jnp.mean((eps - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_st = tx.update(grads, opt_st, lora)
        return optax.apply_updates(lora, updates), opt_st, loss

    @functools.partial(jax.jit, donate_argnums=(3, 4))
    def ensemble_step(base, lat_all, ehs_one, stacked, opt_state, key):
        keys = jax.random.split(key, NUM_MEMBERS)
        ehs_b = jnp.broadcast_to(ehs_one, (BATCH,) + ehs_one.shape[1:])
        return jax.vmap(
            member_step, in_axes=(None, None, None, 0, 0, 0, 0, 0)
        )(base, lat_all, ehs_b, stacked, opt_state, table_j, sizes_j, keys)

    sample_shape = (N_SAMPLE_IMAGES, size, size, ch)

    @jax.jit
    def ensemble_sample(base, ehs_one, stacked, key):
        keys = jax.random.split(key, NUM_MEMBERS)
        ehs_s = jnp.broadcast_to(ehs_one, (N_SAMPLE_IMAGES,) + ehs_one.shape[1:])
        return jax.vmap(
            lambda lo, k: sample_loop(
                model.apply, lora_merge(base, lo), schedule, sched_spec,
                sample_shape, k, num_inference_steps=SAMPLE_STEPS, kind="ddim",
                encoder_hidden_states=ehs_s,
            )
        )(stacked, keys)

    print(f"# unet params: {n_params/1e6:.0f}M; lora params/member: {n_lora/1e6:.1f}M",
          flush=True)
    stacked, opt_state, _ = ensemble_step(
        base_params, latents, ehs, stacked, opt_state, jax.random.PRNGKey(-1)
    )
    jax.block_until_ready(stacked)
    print("# train step compiled", flush=True)
    imgs = ensemble_sample(base_params, ehs, stacked, jax.random.PRNGKey(-2))
    jax.block_until_ready(imgs)
    print("# sampler compiled", flush=True)

    t0 = time.time()
    for i in range(TRAIN_STEPS):
        stacked, opt_state, loss = ensemble_step(
            base_params, latents, ehs, stacked, opt_state, jax.random.PRNGKey(i)
        )
    jax.block_until_ready(stacked)
    train_s = time.time() - t0

    t0 = time.time()
    imgs = ensemble_sample(base_params, ehs, stacked, jax.random.PRNGKey(777))
    jax.block_until_ready(imgs)
    sample_s = time.time() - t0

    total_s = train_s + sample_s
    passes_per_hour = NUM_MEMBERS / (total_s / 3600.0)
    print(
        json.dumps(
            {
                "metric": "sd_lora_subset_passes_per_hour_per_chip",
                "value": round(passes_per_hour, 2),
                "unit": "passes/hour/chip",
                "vs_baseline": round(passes_per_hour / BASELINE_PASSES_PER_HOUR, 2),
                "detail": {
                    "num_members": NUM_MEMBERS,
                    "train_steps": TRAIN_STEPS,
                    "batch": BATCH,
                    "rank": RANK,
                    "n_sample_images": N_SAMPLE_IMAGES,
                    "sample_steps": SAMPLE_STEPS,
                    "train_s": round(train_s, 1),
                    "sample_s": round(sample_s, 1),
                    "unet_params_m": round(n_params / 1e6),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
