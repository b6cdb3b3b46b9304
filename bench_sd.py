"""SD-workload benchmark: miniSD-architecture LoRA subset passes per hour.

Apples-to-apples with the reference's headline efficiency numbers
(BASELINE.md): one subset pass = 200 LoRA fine-tuning steps at batch 64 on
the miniSD U-Net (SD 1.x at 256px -> 32x32 latents, rank-256 LoRA) plus
50-image 100-step DDIM sampling — the sparse-gd recipe the reference times
at 646 s/subset on an RTX 6000 (~5.6 passes/hour/GPU).

TPU-native structure (what makes this fast):
  * NUM_MEMBERS subset LoRAs train as ONE compiled program (vmap over
    members) against a single shared frozen bf16 base — LoRA rides as a
    side branch (models.layers.LoRADense), so no per-member merged copy of
    the 860M base ever exists in HBM.
  * The whole 200-step train loop is a `lax.scan` inside one jit: one
    dispatch for the entire fine-tune, no per-step host round-trips.
  * Sampling batches members x 50 images through the U-Net per DDIM step,
    also with side-branch LoRA, as one jit.
  * Optimizer state can be blockwise-int8 (training.quantized.adam8bit) to
    stretch member count; captions/latents are precomputed so the hot loop
    is U-Net-only, like the reference's cached-latent recipe.

Config via env: SD_MEMBERS (default 4), SD_BATCH (64 = exact reference
recipe), SD_OPT (adamw|adam8bit), SD_TRAIN_STEPS, SD_SAMPLE_IMAGES.

Run separately from bench.py (the default driver bench): the first compile
of the 860M-param vmapped program through this image's remote-compile relay
can take tens of minutes.

Roofline context (see ROADMAP.md "SD roofline" for the measured numbers):
one exact-recipe pass costs ~43,400 U-Net forward-equivalents (200 steps x
batch 64 x 3 for fwd+bwd + 50 images x 100 DDIM steps); with the U-Net
forward FLOPs reported by XLA's cost analysis this bounds passes/hour/chip
at peak bf16 throughput — the single-chip ceiling. The 50x BASELINE.md
target is a v5p-8 figure: members shard over the mesh "ensemble" axis with
zero cross-member communication (see __graft_entry__.dryrun_multichip), so
passes/hour scales linearly with chips.
"""

import functools
import json
import os
import time

import numpy as np

NUM_MEMBERS = int(os.environ.get("SD_MEMBERS", "4"))
TRAIN_STEPS = int(os.environ.get("SD_TRAIN_STEPS", "200"))
BATCH = int(os.environ.get("SD_BATCH", "64"))
N_SAMPLE_IMAGES = int(os.environ.get("SD_SAMPLE_IMAGES", "50"))
SAMPLE_STEPS = 100
RANK = 256
OPT = os.environ.get("SD_OPT", "adam8bit")
# Steps per scan dispatch: this image's remote-execute relay times out
# single dispatches of a few minutes, so the 200-step loop runs as a few
# ~40 s scan chunks (still no per-step host round-trips).
SCAN_CHUNK = int(os.environ.get("SD_SCAN_CHUNK", "25"))
REMAT = os.environ.get("SD_REMAT", "1") == "1"
# Selective remat: "full" (recompute whole blocks), "convs" (save 3x3 conv
# outputs, recompute the rest), "convs_dots" (also save dense projections).
# Default "convs": saving the tagged 3x3-conv outputs instead of
# recomputing whole blocks measured 40.52 passes/h vs 39.49 for full-block
# remat (same chip, same day; v5e, 4 members x batch 64).
REMAT_POLICY = os.environ.get("SD_REMAT_POLICY", "convs")
# Gradient microbatching: accumulate the member's batch-64 gradient over
# BATCH/SD_MICROBATCH sequential slices (lax.scan, so only one slice's
# activations are ever live). Identical training trajectory to the
# whole-batch step modulo fp summation order (the MSE mean decomposes);
# what it buys is activation memory — the members/chip ceiling is
# activation-bound: 5 members whole-batch OOMs 16 GB HBM by just 76 MB,
# 6 by 387 MB (docs/sd_members_table.jsonl). 0 = whole-batch step.
MICROBATCH = int(os.environ.get("SD_MICROBATCH", "0"))
if MICROBATCH and BATCH % MICROBATCH:
    raise SystemExit(
        f"SD_MICROBATCH={MICROBATCH} must divide SD_BATCH={BATCH} "
        "(the batch is reshaped into equal accumulation slices)"
    )
BASELINE_PASSES_PER_HOUR = 3600.0 / 646.0  # reference sparse-gd total


def main():
    from bench import _probe_backend

    _probe_backend()

    from group_attribution_for_diffusion_models_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

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
        lora_collection,
        lora_init,
    )
    from group_attribution_for_diffusion_models_tpu.parallel.ensemble import (
        pad_member_indices,
    )
    from group_attribution_for_diffusion_models_tpu.training import make_optimizer
    from group_attribution_for_diffusion_models_tpu.training.quantized import (
        adam8bit,
    )

    spec = MINISD_UNET
    if os.environ.get("SD_TINY"):  # plumbing smoke test (CPU-friendly)
        from group_attribution_for_diffusion_models_tpu.cli.train_text_to_image_lora import (
            tiny_sd_spec,
        )

        spec = tiny_sd_spec(8)
    sched_spec = MINISD_SCHEDULER
    schedule = make_schedule(sched_spec)
    # remat=False fits 1 member x batch 64 in HBM and skips the ~1/3
    # recompute; remat=True is what lets >= 4 members train concurrently.
    model = UNet2D(spec, dtype=jnp.bfloat16, remat=REMAT, remat_policy=REMAT_POLICY)

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
    if OPT == "adam8bit":
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            adam8bit(optax.cosine_decay_schedule(3e-4, max(TRAIN_STEPS, 1))),
        )
    else:
        tx = make_optimizer("adamw", lr=3e-4, lr_schedule="cosine",
                            total_steps=TRAIN_STEPS)
    if os.environ.get("SD_OPT_FLAT", "0") == "1":
        # Single-flat-vector optimizer state: the per-leaf form spends
        # ~9% of the train step in per-LoRA-leaf requant reduces
        # (docs/profile_sd_train.txt convert_reduce_fusion).
        tx = optax.flatten(tx)
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

        def loss_fn(lo, lat_i, noise_i, t_i, ehs_i):
            x_t = add_noise(schedule, lat_i, noise_i, t_i)
            eps = model.apply(
                {"params": base, "lora": lora_collection(lo)}, x_t, t_i, ehs_i
            )
            return jnp.mean((eps - noise_i) ** 2)

        if MICROBATCH and MICROBATCH < BATCH:
            # Sequential gradient accumulation over equal batch slices: the
            # scan carry is the (small) LoRA grad tree, so slice activations
            # are freed between iterations instead of coexisting. The
            # conditioning rides the scan xs like lat/noise/t so each slice
            # trains against ITS OWN embeddings (with per-example captions,
            # reusing slice 0's would silently miscondition slices 1..n).
            nm = BATCH // MICROBATCH
            xs = (
                lat.reshape((nm, MICROBATCH) + lat.shape[1:]),
                noise.reshape((nm, MICROBATCH) + noise.shape[1:]),
                t.reshape(nm, MICROBATCH),
                ehs_b.reshape((nm, MICROBATCH) + ehs_b.shape[1:]),
            )

            def micro(carry, sl):
                g_acc, l_acc = carry
                l, g = jax.value_and_grad(loss_fn)(lora, *sl)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, l_acc + l), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, lora)
            (g_sum, l_sum), _ = jax.lax.scan(micro, (zero, 0.0), xs)
            grads = jax.tree_util.tree_map(lambda g: g / nm, g_sum)
            loss = l_sum / nm
        else:
            loss, grads = jax.value_and_grad(
                lambda lo: loss_fn(lo, lat, noise, t, ehs_b)
            )(lora)
        updates, opt_st = tx.update(grads, opt_st, lora)
        return optax.apply_updates(lora, updates), opt_st, loss

    @functools.partial(jax.jit, donate_argnums=(3, 4), static_argnums=(6,))
    def ensemble_train(base, lat_all, ehs_one, stacked, opt_state, key, n_steps):
        """The whole fine-tune as one dispatch: lax.scan over n_steps, vmap
        over members inside the body."""
        ehs_b = jnp.broadcast_to(ehs_one, (BATCH,) + ehs_one.shape[1:])

        def body(carry, step_key):
            stacked, opt_state = carry
            keys = jax.random.split(step_key, NUM_MEMBERS)
            stacked, opt_state, loss = jax.vmap(
                member_step, in_axes=(None, None, None, 0, 0, 0, 0, 0)
            )(base, lat_all, ehs_b, stacked, opt_state, table_j, sizes_j, keys)
            return (stacked, opt_state), loss

        step_keys = jax.random.split(key, n_steps)
        (stacked, opt_state), losses = jax.lax.scan(
            body, (stacked, opt_state), step_keys
        )
        return stacked, opt_state, losses

    sample_shape = (N_SAMPLE_IMAGES, size, size, ch)

    @jax.jit
    def ensemble_sample(base, ehs_one, stacked, key):
        keys = jax.random.split(key, NUM_MEMBERS)
        ehs_s = jnp.broadcast_to(ehs_one, (N_SAMPLE_IMAGES,) + ehs_one.shape[1:])

        def member_sample(lo, k):
            coll = lora_collection(lo)

            def apply_fn(variables, *a, **kw):
                return model.apply(
                    {"params": variables["params"], "lora": coll}, *a, **kw
                )

            return sample_loop(
                apply_fn, base, schedule, sched_spec, sample_shape, k,
                num_inference_steps=SAMPLE_STEPS, kind="ddim",
                encoder_hidden_states=ehs_s,
            )

        return jax.vmap(member_sample, in_axes=(0, 0))(stacked, keys)

    print(f"# unet params: {n_params/1e6:.0f}M; lora params/member: {n_lora/1e6:.1f}M; "
          f"members={NUM_MEMBERS} batch={BATCH} opt={OPT}", flush=True)

    # Chunk sizes covering TRAIN_STEPS exactly (the last chunk carries the
    # remainder, so a TRAIN_STEPS that isn't a SCAN_CHUNK multiple doesn't
    # silently train extra steps and skew the throughput numbers).
    chunk = min(SCAN_CHUNK, TRAIN_STEPS)
    chunk_sizes = [chunk] * (TRAIN_STEPS // chunk) if chunk else []
    if TRAIN_STEPS - sum(chunk_sizes):
        chunk_sizes.append(TRAIN_STEPS - sum(chunk_sizes))

    # Warm up with the exact shapes/static args the timed region uses, so the
    # timed calls hit the cached executables (keys differ, so the relay's
    # execution memoization cannot short-circuit the timed runs).
    t_c0 = time.time()
    for n in sorted(set(chunk_sizes)):
        stacked, opt_state, _ = ensemble_train(
            base_params, latents, ehs, stacked, opt_state,
            jax.random.PRNGKey(-1), n,
        )
    jax.block_until_ready(stacked)
    print(f"# train loop compiled+warm ({time.time()-t_c0:.0f}s)", flush=True)

    t_c0 = time.time()
    imgs = ensemble_sample(base_params, ehs, stacked, jax.random.PRNGKey(-2))
    jax.block_until_ready(imgs)
    print(f"# sampler compiled+warm ({time.time()-t_c0:.0f}s)", flush=True)

    t0 = time.time()
    losses = None
    for c, n in enumerate(chunk_sizes):
        stacked, opt_state, losses = ensemble_train(
            base_params, latents, ehs, stacked, opt_state,
            jax.random.PRNGKey(1 + c), n,
        )
    jax.block_until_ready(stacked)
    train_s = time.time() - t0

    t0 = time.time()
    imgs = ensemble_sample(base_params, ehs, stacked, jax.random.PRNGKey(777))
    jax.block_until_ready(imgs)
    sample_s = time.time() - t0

    # XLA-reported FLOPs for the roofline note (after timing so a slow
    # cost-analysis path cannot pollute the measurement; unavailable on some
    # relays).
    train_gflops = sample_gflops = None
    try:
        if chunk:
            c = ensemble_train.lower(
                base_params, latents, ehs, stacked, opt_state,
                jax.random.PRNGKey(0), chunk,
            ).compile().cost_analysis()
            c = c[0] if isinstance(c, (list, tuple)) else c
            # per-step flops from the chunk executable, scaled to the run.
            train_gflops = c.get("flops", 0.0) / 1e9 * (TRAIN_STEPS / chunk)
    except Exception:
        pass
    try:
        c = ensemble_sample.lower(
            base_params, ehs, stacked, jax.random.PRNGKey(0)
        ).compile().cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else c
        sample_gflops = c.get("flops", 0.0) / 1e9
    except Exception:
        pass

    total_s = train_s + sample_s
    passes_per_hour = NUM_MEMBERS / (total_s / 3600.0)
    # Model-FLOPs throughput (analytic: 164.49 GFLOP per miniSD forward at
    # 32x32x4, XLA cost analysis; fwd+bwd = 3x fwd, remat recompute not
    # counted — i.e. this is MFU-style useful work, not executed work).
    fwd_tflop = 0.16449
    train_model_tflop = TRAIN_STEPS * NUM_MEMBERS * BATCH * fwd_tflop * 3
    sample_model_tflop = NUM_MEMBERS * N_SAMPLE_IMAGES * SAMPLE_STEPS * fwd_tflop

    detail = {
        "num_members": NUM_MEMBERS,
        "train_steps": TRAIN_STEPS,
        "batch": BATCH,
        "rank": RANK,
        "opt": OPT,
        "remat": REMAT,
        "remat_policy": REMAT_POLICY,
        "scan_chunk": chunk,
        # Rows land in docs/sd_members_table.jsonl; a microbatched run has a
        # different activation footprint than a whole-batch one and must be
        # distinguishable in the OOM-bracket evidence.
        "microbatch": MICROBATCH,
        "train_model_tflops_per_s": (
            round(train_model_tflop / train_s, 1) if train_s else None),
        "sample_model_tflops_per_s": round(sample_model_tflop / sample_s, 1),
        "n_sample_images": N_SAMPLE_IMAGES,
        "sample_steps": SAMPLE_STEPS,
        "train_s": round(train_s, 1),
        "sample_s": round(sample_s, 1),
        "unet_params_m": round(n_params / 1e6),
        "final_loss": (round(float(np.asarray(losses)[-1].mean()), 4)
                       if losses is not None else None),
    }
    if train_gflops:
        detail["train_tflops_per_s"] = round(train_gflops / 1e3 / train_s, 1)
    if sample_gflops:
        detail["sample_tflops_per_s"] = round(sample_gflops / 1e3 / sample_s, 1)
    print(
        json.dumps(
            {
                "metric": "sd_lora_subset_passes_per_hour_per_chip",
                "value": round(passes_per_hour, 2),
                "unit": "passes/hour/chip",
                "vs_baseline": round(passes_per_hour / BASELINE_PASSES_PER_HOUR, 2),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
