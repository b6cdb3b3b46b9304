"""Per-op device profile of the benchmark train/sample steps.

Answers VERDICT round-2 "What's weak" #1 with data: where does the step
time actually go (convolutions vs GN/SiLU fusions vs attention custom
calls vs optimizer), and what FLOP rate does each op achieve vs the v5e
bf16 peak (~197 TFLOP/s 8x128x128 MXU)?

  WORKLOAD=cifar  python scripts/profile_step.py   # bench.py's 8x64 step
  WORKLOAD=sd     python scripts/profile_step.py   # bench_sd's 4x64 LoRA step
  PHASE=sample    ...                               # profile the DDIM step

Prints the rolled-up category table and top ops; writes the full table to
docs/profile_<workload>_<phase>.txt for the ROADMAP.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKLOAD = os.environ.get("WORKLOAD", "cifar")
PHASE = os.environ.get("PHASE", "train")
REPEATS = int(os.environ.get("REPEATS", "3"))


def build_cifar():
    import jax
    import jax.numpy as jnp
    import numpy as np

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

    num_members, batch = 8, 64
    cfg = get_config("cifar")
    model = UNet2D(cfg.unet, dtype=jnp.bfloat16, remat=False)
    schedule = make_schedule(cfg.scheduler)
    n = 2048
    ds = make_synthetic(n=n, size=32)
    images_u8 = ((ds.images + 1.0) * 127.5).astype(np.uint8)
    member_idx = [sample_removal("shapley", n, seed=s)[0] for s in range(num_members)]
    trainer = EnsembleTrainer(
        apply_fn=model.apply, tx=make_optimizer("adam", lr=1e-4),
        schedule=schedule, spec=cfg.scheduler, images_u8=images_u8,
        member_indices=member_idx, batch_size=batch,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    state = trainer.init_state(params=params)

    if PHASE == "train":
        # One scanned chunk of a few steps: the executable is the same one
        # bench.py times (scan body = vmapped member step). run_scanned
        # donates the state, so rebind it each call.
        cell = {"state": state}

        def run_once(i=[0]):
            i[0] += 1
            s, _ = trainer.run_scanned(cell["state"], 4, seed=1000 + i[0])
            jax.block_until_ready(s)
            cell["state"] = s

        run_once()  # compile + warm; populates trainer._scan_jit
        keys = jax.vmap(jax.random.PRNGKey)(jnp.zeros((4,), jnp.uint32))
        hlo = trainer._scan_jit.lower(
            cell["state"], keys, trainer._images, trainer._table, trainer._sizes
        ).compile().as_text()
        return run_once, hlo
    else:
        sample_shape = (50, 32, 32, 3)

        @jax.jit
        def ensemble_sample(stacked_params, key):
            keys = jax.random.split(key, num_members)
            return jax.vmap(
                lambda p, k: sample_loop(
                    model.apply, p, schedule, cfg.scheduler, sample_shape, k,
                    num_inference_steps=10, kind="ddim",
                )
            )(stacked_params, keys)

        lowered = ensemble_sample.lower(state.ema_params, jax.random.PRNGKey(0))
        compiled = lowered.compile()
        hlo = compiled.as_text()
        out = ensemble_sample(state.ema_params, jax.random.PRNGKey(0))
        jax.block_until_ready(out)

        def run_once(i=[0]):
            i[0] += 1
            jax.block_until_ready(
                ensemble_sample(state.ema_params, jax.random.PRNGKey(i[0]))
            )

        return run_once, hlo


def build_sd():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from group_attribution_for_diffusion_models_tpu.config.registry import (
        MINISD_SCHEDULER, MINISD_UNET,
    )
    from group_attribution_for_diffusion_models_tpu.data import sample_removal
    from group_attribution_for_diffusion_models_tpu.diffusion import make_schedule
    from group_attribution_for_diffusion_models_tpu.diffusion.sampling import sample_loop
    from group_attribution_for_diffusion_models_tpu.diffusion.schedulers import add_noise
    from group_attribution_for_diffusion_models_tpu.models import UNet2D
    from group_attribution_for_diffusion_models_tpu.models.lora import (
        lora_collection, lora_init,
    )
    from group_attribution_for_diffusion_models_tpu.parallel.ensemble import (
        pad_member_indices,
    )
    from group_attribution_for_diffusion_models_tpu.training.quantized import adam8bit

    num_members = int(os.environ.get("SD_MEMBERS", "4"))
    batch = int(os.environ.get("SD_BATCH", "64"))
    rank = 256
    scan_steps = int(os.environ.get("SD_PROFILE_STEPS", "2"))
    spec, sched_spec = MINISD_UNET, MINISD_SCHEDULER
    schedule = make_schedule(sched_spec)
    model = UNet2D(
        spec, dtype=jnp.bfloat16, remat=os.environ.get("SD_REMAT", "1") == "1",
        remat_policy=os.environ.get("SD_REMAT_POLICY", "convs"),
    )
    size, ch = spec.sample_size, spec.in_channels
    base_params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, ch)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, spec.cross_attention_dim)),
    )["params"]
    base_params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), base_params)
    n_data = 5000
    rng = np.random.RandomState(0)
    latents = jnp.asarray(rng.normal(size=(n_data, size, size, ch)).astype(np.float32))
    ehs = jnp.asarray(rng.normal(size=(1, 77, spec.cross_attention_dim)).astype(np.float32))
    member_idx = [sample_removal("shapley", n_data, seed=s)[0] for s in range(num_members)]
    table, sizes = pad_member_indices(member_idx)
    table_j, sizes_j = jnp.asarray(table), jnp.asarray(sizes)
    trees = [lora_init(base_params, rank=rank, key=jax.random.PRNGKey(100 + s))
             for s in range(num_members)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     adam8bit(optax.cosine_decay_schedule(3e-4, 200)))
    opt_state = jax.vmap(tx.init)(stacked)

    def member_step(base, lat_all, ehs_b, lora, opt_st, table_row, msize, key):
        k_idx, k_t, k_n = jax.random.split(key, 3)
        slot = jax.random.randint(k_idx, (batch,), 0, msize)
        lat = lat_all[table_row[slot]]
        t = jax.random.randint(k_t, (batch,), 0, sched_spec.num_train_timesteps)
        noise = jax.random.normal(k_n, lat.shape)

        def loss_fn(lo):
            x_t = add_noise(schedule, lat, noise, t)
            eps = model.apply({"params": base, "lora": lora_collection(lo)},
                              x_t, t, ehs_b)
            return jnp.mean((eps - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_st = tx.update(grads, opt_st, lora)
        return optax.apply_updates(lora, updates), opt_st, loss

    @functools.partial(jax.jit, static_argnums=(5,))
    def ensemble_train(base, lat_all, ehs_one, stacked, opt_state, n_steps, key):
        ehs_b = jnp.broadcast_to(ehs_one, (batch,) + ehs_one.shape[1:])

        def body(carry, step_key):
            stacked, opt_state = carry
            keys = jax.random.split(step_key, num_members)
            stacked, opt_state, loss = jax.vmap(
                member_step, in_axes=(None, None, None, 0, 0, 0, 0, 0)
            )(base, lat_all, ehs_b, stacked, opt_state, table_j, sizes_j, keys)
            return (stacked, opt_state), loss

        step_keys = jax.random.split(key, n_steps)
        (stacked, opt_state), losses = jax.lax.scan(body, (stacked, opt_state), step_keys)
        return stacked, opt_state, losses

    if PHASE == "train":
        t0 = time.time()
        lowered = ensemble_train.lower(
            base_params, latents, ehs, stacked, opt_state, scan_steps,
            jax.random.PRNGKey(0))
        compiled = lowered.compile()
        hlo = compiled.as_text()
        print(f"# compiled in {time.time()-t0:.0f}s", flush=True)
        out = ensemble_train(base_params, latents, ehs, stacked, opt_state,
                             scan_steps, jax.random.PRNGKey(0))
        jax.block_until_ready(out)

        def run_once(i=[0]):
            i[0] += 1
            jax.block_until_ready(ensemble_train(
                base_params, latents, ehs, stacked, opt_state, scan_steps,
                jax.random.PRNGKey(i[0])))

        return run_once, hlo
    else:
        n_images = int(os.environ.get("SD_SAMPLE_IMAGES", "8"))
        sample_shape = (n_images, size, size, ch)

        @jax.jit
        def ensemble_sample(base, ehs_one, stacked, key):
            keys = jax.random.split(key, num_members)
            ehs_s = jnp.broadcast_to(ehs_one, (n_images,) + ehs_one.shape[1:])

            def member_sample(lo, k):
                coll = lora_collection(lo)

                def apply_fn(variables, *a, **kw):
                    return model.apply(
                        {"params": variables["params"], "lora": coll}, *a, **kw)

                return sample_loop(apply_fn, base_params, schedule, sched_spec,
                                   sample_shape, k, num_inference_steps=10,
                                   kind="ddim", encoder_hidden_states=ehs_s)

            return jax.vmap(member_sample, in_axes=(0, 0))(stacked, keys)

        lowered = ensemble_sample.lower(base_params, ehs, stacked, jax.random.PRNGKey(0))
        compiled = lowered.compile()
        hlo = compiled.as_text()
        out = ensemble_sample(base_params, ehs, stacked, jax.random.PRNGKey(0))
        jax.block_until_ready(out)

        def run_once(i=[0]):
            i[0] += 1
            jax.block_until_ready(ensemble_sample(
                base_params, ehs, stacked, jax.random.PRNGKey(i[0])))

        return run_once, hlo


def main():
    from group_attribution_for_diffusion_models_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    from group_attribution_for_diffusion_models_tpu.utils.hlo_profile import (
        profile_device_ops, render_table,
    )

    run_once, hlo = build_sd() if WORKLOAD == "sd" else build_cifar()
    # Timed (untraced) wall time first for context.
    t0 = time.time()
    for _ in range(REPEATS):
        run_once()
    wall = (time.time() - t0) / REPEATS
    print(f"# untraced wall: {wall*1e3:.1f} ms/exec", flush=True)

    prof = profile_device_ops(run_once, hlo_text=hlo, repeats=REPEATS)
    table = render_table(prof, top=40, repeats=REPEATS)
    print(table, flush=True)
    os.makedirs("docs", exist_ok=True)
    out_path = f"docs/profile_{WORKLOAD}_{PHASE}.txt"
    with open(out_path, "w") as f:
        f.write(f"# wall {wall*1e3:.1f} ms/exec, repeats={REPEATS}\n")
        f.write(render_table(prof, top=200, repeats=REPEATS) + "\n")
    print(f"# full table -> {out_path}")


if __name__ == "__main__":
    main()
