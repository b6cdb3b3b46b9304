"""LoRA fine-tuning of a text-to-image latent-diffusion model on a
contributor-group removal subset.

CLI mirror of reference text_to_image/train_text_to_image_lora.py:577-1545,
rebuilt TPU-first:

* Frozen towers (U-Net base, CLIP text encoder, KL-VAE) run inside the same
  XLA graph; only the LoRA pytree receives gradients through the functional
  merge (models.lora) — no parameter freezing plumbing, no vendored
  attention processors for heterogeneous ranks.
* Caption embeddings and VAE latents precompute once (captions per group are
  constant), so the hot loop touches no tower but the U-Net.
* Group-unit removal (artist/filename) samples over the group table with the
  seed-deterministic removal samplers and persists removal_idx.csv
  (reference :935-1024).
* Methods: retrain (LoRA from scratch), pruned_ft (continue from pruned
  LoRA), gd / sparse_gd (200-step unlearning from a trained (pruned) LoRA,
  reference src/ddpm_config.py:645-672).
* --num_seeds > 1 trains MANY subset LoRAs as one vmapped program — the
  ensemble lever applied to the reference's most expensive workload.

Idempotence: exits early if the final LoRA file exists (reference :649-657).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..config.registry import (
    MINISD_SCHEDULER,
    MINISD_UNET,
    PROMPTS_ARTBENCH,
    SchedulerSpec,
    UNetSpec,
)
from ..data import create_dataset
from ..data.groups import group_removal_split
from ..diffusion import make_schedule
from ..models import UNet2D
from ..models.clip_text import CLIPTextEncoder
from ..models.lora import lora_init, lora_merge, lora_num_params
from ..training.state import make_optimizer
from ..utils import append_record
from .common import (
    add_sd_pretrained_args,
    provenance_row,
    sd_base_params,
    sd_text_params,
)


def tiny_sd_spec(size: int = 8) -> UNetSpec:
    """Miniature conditional U-Net for smoke tests on synthetic data."""
    return UNetSpec(
        sample_size=size,
        in_channels=4,
        out_channels=4,
        block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1,
        norm_num_groups=4,
        attention_head_dim=2,
        cross_attention_dim=32,
    )


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", type=str, default="artbench",
                        help="'artbench' or synthetic_* for smoke runs")
    parser.add_argument("--cls", type=str, default="post_impressionism")
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--db", type=str, default=None)
    parser.add_argument("--method", type=str, default="retrain",
                        choices=["retrain", "pruned_ft", "gd", "sparse_gd"])
    parser.add_argument("--removal_dist", type=str, default="shapley",
                        choices=["uniform", "uniform_paired", "datamodel",
                                 "shapley", "shapley_paired", "loo",
                                 "aoi", "full", "counterfactual"])
    parser.add_argument("--removal_seed", type=int, default=0)
    parser.add_argument("--num_seeds", type=int, default=1,
                        help=">1 trains an ensemble of subset LoRAs at once")
    parser.add_argument("--datamodel_alpha", type=float, default=0.5)
    parser.add_argument("--removal_unit", type=str, default="artist",
                        choices=["artist", "filename"])
    parser.add_argument("--rank_file", type=str, default=None,
                        help="unit-index ranking .npy for counterfactual "
                             "removal (reference :596-604,991-1014)")
    parser.add_argument("--masked_proportion", type=float, default=0.1)
    parser.add_argument("--direction", type=str, default="top",
                        choices=["top", "bottom"])
    parser.add_argument("--rank", type=int, default=256)
    parser.add_argument("--learning_rate", type=float, default=3e-4)
    parser.add_argument("--max_train_steps", type=int, default=200)
    parser.add_argument("--train_batch_size", type=int, default=64)
    parser.add_argument("--snr_gamma", type=float, default=None)
    parser.add_argument("--microbatch", type=int, default=0,
                        help="gradient-accumulation slice size: each member "
                             "accumulates its batch gradient over "
                             "batch/microbatch sequential slices (lax.scan, "
                             "only one slice's activations live at a time). "
                             "Identical trajectory to the whole-batch step "
                             "modulo fp summation order; trades step time "
                             "for activation HBM — the members/chip "
                             "ceiling is activation-bound "
                             "(docs/sd_members_table.jsonl). 0 = whole "
                             "batch.")
    parser.add_argument("--lora_dir", type=str, default=None,
                        help="trained/pruned LoRA .npz to start from (gd/pruned_ft)")
    parser.add_argument("--opt_seed", type=int, default=42)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--log_freq", type=int, default=50)
    parser.add_argument("--mesh_ensemble", type=int, default=None,
                        help="shard the LoRA ensemble over this many devices "
                             "(default: min(num_seeds, device count); 1 "
                             "disables sharding)")
    parser.add_argument("--tracker", type=str, default="none",
                        choices=["none", "jsonl", "wandb", "tensorboard"],
                        help="training-scalar tracker (reference logs via "
                             "accelerate trackers, "
                             "train_text_to_image_lora.py:1146,1322)")
    add_sd_pretrained_args(parser)
    return parser.parse_args(argv)


def _load_lora_npz(path):
    import jax.numpy as jnp

    store = np.load(path)
    tree = {}
    for key in store.files:
        name, leaf = key.rsplit("::", 1)
        tree.setdefault(name, {})[leaf] = jnp.asarray(store[key])
    return tree


def _save_lora_npz(path, tree):
    flat = {
        f"{name}::{leaf}": np.asarray(v)
        for name, ab in tree.items()
        for leaf, v in ab.items()
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    args = parse_args(argv)
    synthetic = args.dataset.startswith("synthetic")
    if args.removal_dist == "counterfactual" and args.num_seeds > 1:
        # Deterministic removal: every member would overwrite one leaf.
        print("counterfactual removal is deterministic; forcing num_seeds=1")
        args.num_seeds = 1
    seeds = list(range(args.removal_seed, args.removal_seed + args.num_seeds))

    # --- data + groups ------------------------------------------------------
    dataset = create_dataset(args.dataset, train=True)
    if synthetic:
        files = [f"artist-{l}_work_{i}.jpg" for i, l in enumerate(dataset.labels)]
        spec = tiny_sd_spec(dataset.images.shape[1])
        sched_spec = SchedulerSpec()
        latent_size, latent_ch = spec.sample_size, 4
    else:
        if dataset.names is None:
            raise SystemExit("artbench dataset needs per-image filenames")
        files = dataset.names
        spec = MINISD_UNET
        sched_spec = MINISD_SCHEDULER
        latent_size, latent_ch = 32, 4
    from ..data.groups import artist_from_filename

    units = sorted({artist_from_filename(f) for f in files}) if args.removal_unit == "artist" else sorted(files)

    removals = []
    for s in seeds:
        if args.removal_dist == "full":
            removals.append((np.arange(len(files)), np.array([], np.int64),
                             np.ones(len(units), np.float32)))
        elif args.removal_dist == "counterfactual":
            # Deterministic: remove the top/bottom proportion of units by an
            # attribution ranking (reference :596-604,991-1014).
            if not args.rank_file:
                raise SystemExit("counterfactual removal needs --rank_file")
            from ..data.groups import counterfactual_split

            remaining, removed = counterfactual_split(
                files, units, np.load(args.rank_file),
                args.masked_proportion, direction=args.direction,
                unit=args.removal_unit,
            )
            unit_of = (
                [artist_from_filename(f) for f in files]
                if args.removal_unit == "artist"
                else [os.path.basename(f) for f in files]
            )
            unit_index = {u: i for i, u in enumerate(units)}
            kept = np.ones(len(units), np.float32)
            for r in removed:
                kept[unit_index[unit_of[r]]] = 0.0
            removals.append((remaining, removed, kept))
        else:
            removals.append(
                group_removal_split(
                    files, units, args.removal_dist, s,
                    alpha=args.datamodel_alpha, unit=args.removal_unit,
                )
            )

    def lora_file(seed):
        if args.removal_dist == "full":
            leaf = "full"
        elif args.removal_dist == "counterfactual":
            leaf = (f"counterfactual_{args.direction}"
                    f"_{args.masked_proportion}")
        else:
            leaf = f"{args.removal_dist}_seed={seed}"
        return os.path.join(
            args.outdir, f"seed{args.opt_seed}",
            f"{args.dataset}_{args.cls}", args.method, "models", leaf,
            "lora_weights.npz",
        )

    pending = [
        (s, r) for s, r in zip(seeds, removals) if not os.path.exists(lora_file(s))
    ]
    if not pending:
        print("all LoRA weights already exist; nothing to do")
        return
    seeds = [s for s, _ in pending]
    removals = [r for _, r in pending]

    # --- frozen towers ------------------------------------------------------
    model = UNet2D(spec)
    x0 = jnp.zeros((1, latent_size, latent_size, latent_ch))
    t0j = jnp.zeros((1,), jnp.int32)
    ehs0 = jnp.zeros((1, 77, spec.cross_attention_dim))
    base_params = sd_base_params(
        args, model.init(jax.random.PRNGKey(args.seed), x0, t0j, ehs0)["params"]
    )

    text = CLIPTextEncoder(width=spec.cross_attention_dim,
                           layers=2 if synthetic else 12,
                           heads=2 if synthetic else 12)
    text_params, tokenize = sd_text_params(args, text)

    # Per-image caption embedding: style prompt + artist (constant per unit)
    prompt = PROMPTS_ARTBENCH.get(args.cls, f"a painting, {args.cls}")
    unit_of_img = [artist_from_filename(f) for f in files]
    unit_prompts = [f"{prompt} by {u}" for u in units]
    input_ids = jnp.asarray(tokenize(unit_prompts))
    unit_emb = np.asarray(text.apply({"params": text_params}, input_ids))
    unit_index = {u: i for i, u in enumerate(units)}
    img_emb_idx = np.asarray([unit_index[u] for u in unit_of_img])

    # VAE latents: synthetic path fakes the encode (4-ch downsample) so smoke
    # runs need no VAE weights; real path uses AutoencoderKL.precompute.
    if synthetic:
        imgs = dataset.images
        latents_all = np.repeat(
            imgs.mean(axis=-1, keepdims=True), latent_ch, axis=-1
        ).astype(np.float32)
    else:
        from ..config.registry import MINISD_VAE
        from ..models.vqvae import load_sd_vae, precompute_latents

        vae, vae_vars = load_sd_vae(MINISD_VAE)
        latents_all = precompute_latents(
            vae, vae_vars, dataset.images,
            cache_path=os.path.join(args.outdir, "precomputed_emb", "vae_latents.npy"),
        )

    schedule = make_schedule(sched_spec)
    total_steps = args.max_train_steps
    tx = make_optimizer(
        "adamw", lr=args.learning_rate, weight_decay=1e-6,
        lr_schedule="cosine", total_steps=total_steps,
    )

    # --- LoRA init per member ----------------------------------------------
    if args.lora_dir:
        base_tree = _load_lora_npz(args.lora_dir)
        print(f"LoRA loaded from {args.lora_dir} ({lora_num_params(base_tree)} params)")
        member_trees = [base_tree for _ in seeds]
    else:
        member_trees = [
            lora_init(base_params, rank=args.rank, key=jax.random.PRNGKey(1000 + s))
            for s in seeds
        ]
    stacked_lora = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *member_trees
    )
    opt_state = jax.vmap(tx.init)(stacked_lora)

    unit_emb_j = jnp.asarray(unit_emb)
    img_emb_idx_j = jnp.asarray(img_emb_idx)
    latents_j = jnp.asarray(latents_all)

    # Per-member index tables.
    from ..parallel.ensemble import pad_member_indices

    table, sizes = pad_member_indices([r[0] for r in removals], pad_multiple=8)
    table_j, sizes_j = jnp.asarray(table), jnp.asarray(sizes)
    batch = min(args.train_batch_size, int(sizes.min()))
    if args.microbatch and batch % args.microbatch:
        raise SystemExit(
            f"--microbatch {args.microbatch} must divide the effective batch "
            f"{batch} (the batch is reshaped into equal accumulation slices)"
        )

    snr = None
    if args.snr_gamma is not None:
        acp = np.asarray(schedule.alphas_cumprod)
        snr = jnp.asarray(acp / (1.0 - acp))

    # Base params / latents / embeddings enter as jit ARGUMENTS — closure
    # capture would embed them as constants in the compile payload (1.7 GB
    # for the real miniSD base).
    def member_step(base, lat_all, emb_all, emb_idx, lora, opt_st, table_row, size, key):
        k_idx, k_t, k_n = jax.random.split(key, 3)
        slot = jax.random.randint(k_idx, (batch,), 0, size)
        idx = table_row[slot]
        lat = lat_all[idx]
        ehs = emb_all[emb_idx[idx]]
        t = jax.random.randint(k_t, (batch,), 0, sched_spec.num_train_timesteps)
        noise = jax.random.normal(k_n, lat.shape)

        def loss_fn(lo, lat_i, noise_i, t_i, ehs_i):
            from ..diffusion.schedulers import add_noise
            from ..models.lora import lora_collection

            x_t = add_noise(schedule, lat_i, noise_i, t_i)
            # LoRA rides as a side branch: no per-member merged copy of the
            # 860M base in HBM (models.layers.LoRADense).
            eps = model.apply(
                {"params": base, "lora": lora_collection(lo)}, x_t, t_i, ehs_i
            )
            err = jnp.mean((eps - noise_i) ** 2, axis=(1, 2, 3))
            if snr is not None:
                w = jnp.minimum(snr[t_i], args.snr_gamma) / snr[t_i]
                err = err * w
            return jnp.mean(err)

        if args.microbatch and args.microbatch < batch:
            # Sequential gradient accumulation (see --microbatch). The
            # conditioning rides the scan xs with lat/noise/t so every slice
            # trains against its OWN per-example embeddings.
            nm = batch // args.microbatch
            xs = (
                lat.reshape((nm, args.microbatch) + lat.shape[1:]),
                noise.reshape((nm, args.microbatch) + noise.shape[1:]),
                t.reshape(nm, args.microbatch),
                ehs.reshape((nm, args.microbatch) + ehs.shape[1:]),
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
                lambda lo: loss_fn(lo, lat, noise, t, ehs)
            )(lora)
        updates, opt_st = tx.update(grads, opt_st, lora)
        import optax as _optax

        lora = _optax.apply_updates(lora, updates)
        return lora, opt_st, loss

    import functools

    # Multi-chip: shard the stacked LoRA states over the mesh's "ensemble"
    # axis (no cross-member communication, so scaling is embarrassing); the
    # frozen base towers / latents / embeddings replicate. This is the SD
    # equivalent of parallel.ensemble's sharded trainer (SURVEY.md §2.7) —
    # one v5p pod slice trains a whole SLURM array of LoRA subset-retrains.
    import math

    mesh = None
    e_axis = args.mesh_ensemble or min(len(seeds), len(jax.devices()))
    e_axis = math.gcd(len(seeds), e_axis)
    if e_axis > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import make_mesh

        mesh = make_mesh((e_axis,), ("ensemble",),
                         devices=jax.devices()[:e_axis])
        sh_e = NamedSharding(mesh, P("ensemble"))
        sh_r = NamedSharding(mesh, P())
        stacked_lora = jax.device_put(stacked_lora, sh_e)
        opt_state = jax.device_put(opt_state, sh_e)
        table_j = jax.device_put(table_j, sh_e)
        sizes_j = jax.device_put(sizes_j, sh_e)
        base_params = jax.device_put(base_params, sh_r)
        latents_j = jax.device_put(latents_j, sh_r)
        unit_emb_j = jax.device_put(unit_emb_j, sh_r)
        img_emb_idx_j = jax.device_put(img_emb_idx_j, sh_r)
        print(f"LoRA ensemble sharded over {e_axis} devices")

    jit_kwargs = {"donate_argnums": (4, 5)}
    if mesh is not None:
        sh_e = NamedSharding(mesh, P("ensemble"))
        sh_r = NamedSharding(mesh, P())
        jit_kwargs["in_shardings"] = (sh_r, sh_r, sh_r, sh_r, sh_e, sh_e, None)
        jit_kwargs["out_shardings"] = (sh_e, sh_e, sh_e)

        # Explicit shard_map over the ensemble axis (not GSPMD auto-sharding):
        # each device runs the same program a smaller unsharded ensemble
        # would, with per-member keys split globally and sliced by shard — so
        # a member's training stream is identical no matter the mesh width,
        # and the XLA:CPU anomaly where auto-partitioned value_and_grad
        # computed member-row-dependent values cannot occur (see
        # parallel/ensemble.py and tests/test_ensemble.py).
        local_nm = len(seeds) // e_axis

        def _ensemble_step(base, lat_all, emb_all, emb_idx, stacked, opt_st, key):
            def shard_body(base, lat_all, emb_all, emb_idx, stacked, opt_st,
                           table, sizes, key):
                member0 = jax.lax.axis_index("ensemble") * local_nm
                keys = jax.random.split(key[0], len(seeds))
                keys = jax.lax.dynamic_slice_in_dim(keys, member0, local_nm)
                return jax.vmap(
                    member_step, in_axes=(None, None, None, None, 0, 0, 0, 0, 0)
                )(base, lat_all, emb_all, emb_idx, stacked, opt_st,
                  table, sizes, keys)

            return jax.shard_map(
                shard_body,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(), P("ensemble"), P("ensemble"),
                          P("ensemble"), P("ensemble"), P(None)),
                out_specs=(P("ensemble"), P("ensemble"), P("ensemble")),
                check_vma=False,
            )(base, lat_all, emb_all, emb_idx, stacked, opt_st,
              table_j, sizes_j, key[None])

        ensemble_step = jax.jit(_ensemble_step, **jit_kwargs)
    else:

        @functools.partial(jax.jit, **jit_kwargs)
        def ensemble_step(base, lat_all, emb_all, emb_idx, stacked, opt_st, key):
            keys = jax.random.split(key, len(seeds))
            return jax.vmap(
                member_step, in_axes=(None, None, None, None, 0, 0, 0, 0, 0)
            )(base, lat_all, emb_all, emb_idx, stacked, opt_st, table_j, sizes_j, keys)

    from .common import tracker_for

    tracker = tracker_for(args, f"{args.dataset}_lora_{args.method}")
    t_start = time.time()
    time_rows = []
    for step_i in range(total_steps):
        stacked_lora, opt_state, losses = ensemble_step(
            base_params, latents_j, unit_emb_j, img_emb_idx_j,
            stacked_lora, opt_state, jax.random.PRNGKey(args.opt_seed * 7 + step_i)
        )
        if (args.log_freq and (step_i + 1) % args.log_freq == 0) or step_i + 1 == total_steps:
            el = time.time() - t_start
            print(
                f"Step[{step_i + 1}/{total_steps}] "
                f"losses={np.asarray(losses).round(4).tolist()} {el:.1f}s",
                flush=True,
            )
            tracker.log(
                {"loss_mean": float(np.mean(np.asarray(losses))),
                 "elapsed_s": el},
                step_i + 1,
            )
        time_rows.append((step_i, time.time() - t_start))
    train_time = time.time() - t_start
    tracker.finish()

    db = args.db or os.path.join(args.outdir, f"{args.dataset}_lora_db.jsonl")
    for m, seed in enumerate(seeds):
        tree = jax.tree_util.tree_map(lambda x: np.asarray(x[m]), stacked_lora)
        path = lora_file(seed)
        _save_lora_npz(path, tree)
        remaining, removed, kept_mask = removals[m]
        d = os.path.dirname(path)
        with open(os.path.join(d, "removal_idx.csv"), "w") as f:
            f.write("idx\n")
            f.writelines(f"{i}\n" for i in removed)
        with open(os.path.join(d, "time.csv"), "w") as f:
            f.write("step,elapsed_s\n")
            f.writelines(f"{s},{t:.3f}\n" for s, t in time_rows)
        append_record(
            db,
            provenance_row(
                args,
                removal_seed=seed,
                loss=float(np.asarray(losses)[m]),
                remaining_idx=remaining,
                removed_idx=removed,
                kept_units=np.flatnonzero(kept_mask),
                lora_params=lora_num_params(tree),
                total_steps_time=train_time / len(seeds),
                lora_path=path,
            ),
        )
    print(f"{len(seeds)} LoRA members in {train_time:.1f}s -> {db}")


if __name__ == "__main__":
    main()
