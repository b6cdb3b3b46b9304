"""Train MANY removal subsets in one compiled program — the SLURM-array killer.

The reference launches one process per removal seed via SLURM job arrays
(reference text_to_image/experiments/train.job:16-21, run.sh). This CLI
replaces an entire array: give it a seed range, and the ensemble engine
trains all subset models simultaneously (vmapped, sharded over the device
mesh), batch-samples every member with the compiled DDIM sampler, writes one
checkpoint per member, and appends one JSONL provenance row per member — the
same rows the LDS tier reads.

Usage (smoke):
    python -m group_attribution_for_diffusion_models_tpu.cli.train_ensemble \
        --dataset synthetic_64x8 --removal_dist shapley --seed_start 0 \
        --num_seeds 8 --training_steps 10 --outdir /tmp/out
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..config import constants
from ..data import create_dataset, sample_removal
from ..diffusion import make_schedule
from ..diffusion.sampling import sample_loop
from ..models import UNet2D
from ..parallel import EnsembleTrainer, make_mesh, unstack_state
from ..training import TrainState, make_optimizer
from ..utils import append_record
from ..utils.ckpt import (
    load_checkpoint, load_meta, load_unet_spec, save_checkpoint,
)
from .common import (
    add_common_args,
    config_for,
    model_output_dir,
    provenance_row,
    save_removal_indices,
    tracker_for,
)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--method", type=str, default="retrain",
                        choices=constants.METHOD)
    parser.add_argument("--seed_start", type=int, default=0)
    parser.add_argument("--num_seeds", type=int, default=8)
    parser.add_argument("--training_steps", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--load", type=str, default=None,
                        help="shared pretrained/pruned start point (sparse-FT)")
    parser.add_argument("--n_samples", type=int, default=0,
                        help="per-member samples to generate after training")
    parser.add_argument("--score", type=str, default="none",
                        choices=["none", "fid", "is", "fid_is"],
                        help="score each member's generated samples INSIDE "
                             "the ensemble loop (needs --n_samples > 0): "
                             "one InceptionV3 pass per member yields FID "
                             "features and IS logits, written to the DB row "
                             "as fid_value / is. This is the reference's "
                             "per-subset sampling+scoring cost "
                             "(calculate_global_scores.py:160-482) paid "
                             "in-pipeline instead of as a separate sweep.")
    parser.add_argument("--inception_weights", type=str, default=None)
    parser.add_argument("--ref_stats", type=str, default=None,
                        help="reference-set Inception stats cache (computed "
                             "from the training set and saved here if "
                             "absent; shared across chunked invocations)")
    parser.add_argument("--eval_loss", action="store_true", default=False,
                        help="record a deterministic eval loss per member: "
                             "diffusion loss on a fixed probe batch with "
                             "fixed noise/timesteps shared across members "
                             "(a cheap low-variance global behavior)")
    parser.add_argument("--eval_probe_size", type=int, default=256)
    parser.add_argument("--eval_t_min", type=int, default=0)
    parser.add_argument("--eval_t_max", type=int, default=None,
                        help="probe-timestep band [min, max). The mid band "
                             "(e.g. 100-600) is where denoising needs data "
                             "knowledge — very low t makes x0 visible in "
                             "x_t, very high t is pure-noise prediction — "
                             "so banding sharpens the behavior's "
                             "subset-composition signal")
    parser.add_argument("--mesh_ensemble", type=int, default=None,
                        help="ensemble-axis size (default: all devices)")
    parser.add_argument("--mesh_data", type=int, default=1)
    parser.add_argument("--bf16", action="store_true", default=False)
    parser.add_argument("--remat", action="store_true", default=False)
    parser.add_argument(
        "--remat_policy",
        default=None,
        choices=["full", "convs", "convs_dots"],
        help="selective remat: what each block saves for backward "
        "(full=nothing, convs=3x3 conv outputs, convs_dots=+dense outputs)",
    )
    parser.add_argument(
        "--removal_masks", type=str, default=None,
        help=".npy of explicit keep-masks, one row per removal seed (row "
        "index = seed). Class-level masks (width = #classes) need "
        "--by_class; image-level masks have width = len(dataset). "
        "Use with --removal_dist enum for exhaustive subset enumeration "
        "(ground-truth Shapley).",
    )
    parser.add_argument(
        "--save_ckpts", action=argparse.BooleanOptionalAction, default=True,
        help="save an orbax checkpoint per member (default). "
        "--no-save_ckpts skips the per-member device->host state pulls — "
        "the dominant cost of mass sweeps whose product is the behavior "
        "DB row, e.g. exhaustive ground-truth enumeration; idempotent "
        "resume then falls back to existing DB rows instead of checkpoint "
        "files.",
    )
    parser.add_argument("--independent_noise", action="store_true",
                        default=False,
                        help="per-member independent init/noise draws. "
                        "Default is COMMON random numbers (every member "
                        "shares init + per-step timestep/noise draws, like "
                        "the reference's fixed-seed SLURM jobs) — subsets "
                        "then differ only through data composition, which "
                        "collapses retrain-noise variance in behavior "
                        "comparisons")
    parser.add_argument("--log_freq", type=int, default=0,
                        help="tracker log interval in steps (0 = only final; "
                             "each log forces one host sync)")
    return parser.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    args = parse_args(argv)
    cfg = config_for(args.dataset)
    # NOT `or`: --training_steps 0 means the untrained null model (the
    # pipeline's y_v0 anchor), not "use the config budget".
    training_steps = (
        args.training_steps
        if args.training_steps is not None
        else cfg.train.training_steps.get(args.method, 1000)
    )
    batch_size = args.batch_size or cfg.train.batch_size

    dataset = create_dataset(args.dataset, train=True)
    seeds = list(range(args.seed_start, args.seed_start + args.num_seeds))
    db = args.db or os.path.join(args.outdir, f"{args.dataset}_train_db.jsonl")

    # Idempotence: members whose final checkpoint already exists are skipped
    # (the sweep-level recovery contract; reference
    # train_text_to_image_lora.py:649-657, find_incomplete_trainings.py).
    # Under --no-save_ckpts the DB row is the completion record instead.
    def _done(seed: int) -> bool:
        from ..utils.ckpt import get_max_steps

        d = model_output_dir(
            args.outdir, args.dataset, args.method, args.removal_dist, seed,
            args.datamodel_alpha if args.removal_dist == "datamodel" else None,
        )
        latest = get_max_steps(d)
        if latest is not None and latest >= training_steps:
            return True
        if not args.save_ckpts and os.path.exists(db):
            from ..utils import filter_records

            # Match on every arg that changes the row's value, not just the
            # subset identity: a sweep with a different datamodel alpha or
            # eval-t band sharing this DB must NOT satisfy the completion
            # check (it would skip the retrain and later abort with missing
            # subset values).
            cond = {
                "dataset": args.dataset, "method": args.method,
                "removal_dist": args.removal_dist, "removal_seed": seed,
            }
            if args.removal_dist == "datamodel":
                cond["datamodel_alpha"] = args.datamodel_alpha
            for rec in filter_records(db, cond):
                if rec.get("training_steps") not in (training_steps,
                                                     args.training_steps):
                    continue
                if (rec.get("eval_t_min", args.eval_t_min) != args.eval_t_min
                        or rec.get("eval_t_max", args.eval_t_max)
                        != args.eval_t_max):
                    continue
                # A row trained without in-loop scoring does not satisfy a
                # scored run: the behavior value is the product.
                if "fid" in args.score and rec.get("fid_value") is None:
                    continue
                if "is" in args.score and rec.get("is") is None:
                    continue
                return True
        return False

    skipped = [s for s in seeds if _done(s)]
    seeds = [s for s in seeds if s not in skipped]
    if skipped:
        print(f"skipping {len(skipped)} already-complete seeds: {skipped}")
    if not seeds:
        print("all members already trained; nothing to do")
        return

    target = dataset.labels if args.by_class else len(dataset)
    if args.removal_masks:
        if args.removal_dist != "enum":
            # Mask-trained members recorded under another dist name would
            # poison downstream filters (e.g. the pipeline's 'full' anchor
            # lookup), so the pairing is mandatory.
            raise SystemExit(
                "--removal_masks requires --removal_dist enum "
                f"(got {args.removal_dist!r})"
            )
        masks = np.load(args.removal_masks)
        if masks.ndim != 2:
            raise SystemExit(
                f"--removal_masks must be 2-D (seeds x units); got shape "
                f"{masks.shape}"
            )
        if args.seed_start + args.num_seeds > len(masks):
            raise SystemExit(
                f"--removal_masks has {len(masks)} rows but seeds run to "
                f"{args.seed_start + args.num_seeds - 1}"
            )
        expected = (int(dataset.labels.max()) + 1) if args.by_class else len(dataset)
        if masks.shape[1] != expected:
            raise SystemExit(
                f"--removal_masks width {masks.shape[1]} != expected "
                f"{expected} ({'classes, --by_class set' if args.by_class else 'images'})"
            )

        def _mask_to_removal(row):
            keep = (
                row.astype(bool)[dataset.labels]
                if args.by_class
                else row.astype(bool)
            )
            return (
                np.flatnonzero(keep).astype(np.int64),
                np.flatnonzero(~keep).astype(np.int64),
            )

        removals = [_mask_to_removal(masks[s]) for s in seeds]
    elif args.removal_dist == "enum":
        raise SystemExit("--removal_dist enum requires --removal_masks")
    else:
        removals = [
            sample_removal(
                args.removal_dist, target, seed=s, alpha=args.datamodel_alpha,
                by_class=args.by_class,
            )
            for s in seeds
        ]
    member_indices = [r[0] for r in removals]
    empty = [s for s, m in zip(seeds, member_indices) if len(m) == 0]
    if empty:
        # Possible for p=0.5 draws (incl. uniform_paired complements of an
        # all-kept base draw) and explicit masks; training on nothing is
        # undefined, so fail loudly instead of batch_size=0 deep in the jit.
        raise SystemExit(
            f"removal seeds {empty} keep zero examples; cannot train empty "
            "members"
        )

    spec = cfg.unet
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.load:
        # Resolve the stored (possibly pruned) architecture BEFORE building
        # the trainer: EnsembleTrainer compiles its step around apply_fn at
        # construction, so the spec swap must happen first.
        loaded_spec = load_unet_spec(load_meta(args.load))
        if loaded_spec is not None:
            spec = loaded_spec
    model = UNet2D(spec, dtype=dtype, remat=args.remat, remat_policy=args.remat_policy)
    x0 = jnp.zeros((1, spec.sample_size, spec.sample_size, spec.in_channels))
    t0j = jnp.zeros((1,), jnp.int32)

    opt = cfg.train.optimizer
    tx = make_optimizer(
        opt.name, lr=args.lr or opt.lr, weight_decay=opt.weight_decay,
        grad_clip_norm=opt.grad_clip_norm,
        maximize=args.method in ("ga", "ga_u"),
    )

    import math

    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        # The ensemble axis must divide the member count; shrink to the gcd
        # and leave surplus devices unused rather than failing the shard.
        e_budget = args.mesh_ensemble or (n_dev // args.mesh_data)
        e_axis = math.gcd(len(seeds), e_budget)
        if e_axis * args.mesh_data > 1:
            mesh = make_mesh(
                (e_axis, args.mesh_data),
                ("ensemble", "data"),
                devices=jax.devices()[: e_axis * args.mesh_data],
            )

    # LDM workloads (celeba): every member trains in the frozen VQ-VAE's
    # latent space; the one-time full-dataset encode is shared across the
    # whole ensemble (reference precomputes per process, main.py:490-546).
    # Pixel workloads keep the uint8 on-device store (4x less HBM).
    decode_fn = None
    if cfg.vqvae is not None:
        from ..models.vqvae import load_vqvae, precompute_latents

        vqvae, vq_vars = load_vqvae(cfg.vqvae, args.vqvae_weights)
        cache = os.path.join(args.outdir, args.dataset, "precomputed_emb",
                             "vqvae_latents.npy")
        train_data = (
            precompute_latents(vqvae, vq_vars, dataset.images, batch_size=32,
                               cache_path=cache)
            * cfg.vqvae.scaling_factor
        ).astype(np.float32)
        scale = cfg.vqvae.scaling_factor

        def decode_fn(z):
            return vqvae.apply(vq_vars, z / scale, method=vqvae.decode)
    else:
        train_data = ((dataset.images + 1.0) * 127.5).round().astype(np.uint8)
    trainer = EnsembleTrainer(
        apply_fn=model.apply,
        tx=tx,
        schedule=make_schedule(cfg.scheduler),
        spec=cfg.scheduler,
        images_u8=train_data,
        member_indices=member_indices,
        batch_size=min(batch_size, min(len(m) for m in member_indices)),
        mesh=mesh,
        common_noise=not args.independent_noise,
    )

    if args.load:
        probe = model.init(jax.random.PRNGKey(0), x0, t0j)["params"]
        loaded, _ = load_checkpoint(
            args.load, TrainState.create(probe, tx)
        )
        state = trainer.init_state(params=loaded.params)
        print(f"all members start from {args.load}")
    else:
        def init_fn(key):
            return model.init(key, x0, t0j)["params"]

        state = trainer.init_state(init_fn=init_fn, seed=args.opt_seed)

    t_start = time.time()
    tracker = tracker_for(args, f"{args.dataset}_ensemble_{args.method}")
    if training_steps > 0:
        # Whole loop as lax.scan chunks on device (one dispatch per chunk of
        # log_freq steps), not one dispatch per step.
        metrics = None
        chunk = args.log_freq if args.log_freq > 0 else training_steps
        state, metrics = trainer.run_scanned(
            state, training_steps, seed=args.opt_seed, chunk=chunk,
        )
        per_step = np.asarray(metrics["loss"])  # (steps, members)
        if args.log_freq > 0:
            for i in range(chunk - 1, training_steps, chunk):
                tracker.log({"loss_mean": float(per_step[i].mean())}, i + 1)
        metrics = {"loss": per_step[-1]}
    else:
        metrics = None
    jax.block_until_ready(state.params)
    train_time = time.time() - t_start
    if metrics is not None:
        # Final log regardless of interval ('0 = only final'), then close.
        tracker.log(
            {"loss_mean": float(np.mean(np.asarray(metrics["loss"])))},
            training_steps,
        )
        losses = np.asarray(metrics["loss"])
    else:
        # training_steps=0: init-only members (the "null model" y_v0 of the
        # Shapley efficiency constraint, reference shapley_lds.py:190-209).
        losses = np.full(len(seeds), np.nan)
    tracker.finish()
    print(
        f"{len(seeds)} members x {training_steps} steps in {train_time:.1f}s; "
        f"losses {losses.round(4).tolist()}"
    )

    eval_losses = None
    if args.eval_loss:
        from ..diffusion.schedulers import add_noise

        schedule_e = make_schedule(cfg.scheduler)
        probe_n = min(args.eval_probe_size, len(dataset))
        # Probe lives in the training space (VQ latents for LDM workloads).
        if cfg.vqvae is not None:
            probe = jnp.asarray(train_data[:probe_n])
        else:
            probe = jnp.asarray(dataset.images[:probe_n])
        key_e = jax.random.PRNGKey(12345)
        k_t, k_n = jax.random.split(key_e)
        t_fixed = jax.random.randint(
            k_t, (probe_n,), args.eval_t_min,
            args.eval_t_max or cfg.scheduler.num_train_timesteps,
        )
        noise_fixed = jax.random.normal(k_n, probe.shape)

        def member_eval(params, probe, noise, t):
            x_t = add_noise(schedule_e, probe, noise, t)
            eps = model.apply({"params": params}, x_t, t)
            return jnp.mean((eps - noise) ** 2)

        def eval_members(ema, probe, noise, t):
            return jax.vmap(member_eval, in_axes=(0, None, None, None))(
                ema, probe, noise, t
            )

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            # Explicit shard_map, NOT GSPMD auto-sharding: the multi-chip
            # dryrun's full-pass layout check caught the auto-partitioned
            # vmapped forward computing ~5e-4-relative different eval losses
            # on the virtual CPU mesh with BIT-IDENTICAL ema params — the
            # same anomaly class as the train-step fix in parallel/ensemble.py
            # (there it was value_and_grad; the behavior rows LDS fits on
            # must not depend on the mesh layout either).
            eval_jit = jax.jit(
                lambda ema, pr, no, tt: jax.shard_map(
                    eval_members, mesh=mesh,
                    in_specs=(P("ensemble"), P(), P(), P()),
                    out_specs=P("ensemble"), check_vma=False,
                )(ema, pr, no, tt)
            )
        else:
            eval_jit = jax.jit(eval_members)
        eval_losses = np.asarray(
            eval_jit(state.ema_params, probe, noise_fixed, t_fixed)
        )
        print(f"eval losses: {eval_losses.round(5).tolist()}")

    sample_time = 0.0
    if args.n_samples > 0:
        shape = (args.n_samples, spec.sample_size, spec.sample_size, spec.in_channels)
        schedule = make_schedule(cfg.scheduler)

        def sample_members(stacked_params, keys):
            return jax.vmap(
                lambda p, k: sample_loop(
                    model.apply, p, schedule, cfg.scheduler, shape, k,
                    num_inference_steps=args.num_inference_steps, kind="ddim",
                    decode_fn=decode_fn,
                )
            )(stacked_params, keys)

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            # shard_map for the same reason as the eval above: member keys
            # split globally, sliced per shard via the in_spec, so samples
            # are mesh-layout-invariant.
            @jax.jit
            def ensemble_sample(stacked_params, key):
                keys = jax.random.split(key, len(seeds))
                return jax.shard_map(
                    sample_members, mesh=mesh,
                    in_specs=(P("ensemble"), P("ensemble")),
                    out_specs=P("ensemble"), check_vma=False,
                )(stacked_params, keys)
        else:

            @jax.jit
            def ensemble_sample(stacked_params, key):
                keys = jax.random.split(key, len(seeds))
                return sample_members(stacked_params, keys)

        t_start = time.time()
        samples = np.asarray(
            ensemble_sample(state.ema_params, jax.random.PRNGKey(args.opt_seed))
        )
        sample_time = time.time() - t_start
        print(f"sampled {samples.shape} in {sample_time:.1f}s")

    fid_vals = is_vals = None
    scoring_time = 0.0
    if args.score != "none":
        if args.n_samples <= 0:
            raise SystemExit(f"--score {args.score} needs --n_samples > 0")
        from ..attributions.global_scores import (
            calculate_fid_from_features,
            compute_feature_stats,
            inception_score_from_logits,
            load_inception,
            load_stats,
            make_feature_fn,
            save_stats,
        )

        t_start = time.time()
        inception, inc_vars = load_inception(args.inception_weights)
        extract = make_feature_fn(inception, inc_vars, batch_size=256)
        samples3 = (
            np.repeat(samples, 3, axis=-1) if samples.shape[-1] == 1 else samples
        )
        ref_stats = None
        if "fid" in args.score:
            if args.ref_stats and os.path.exists(args.ref_stats):
                ref_stats = load_stats(args.ref_stats)
            else:
                ref_imgs = dataset.images[:2048] / 2.0 + 0.5
                if ref_imgs.shape[-1] == 1:
                    ref_imgs = np.repeat(ref_imgs, 3, axis=-1)
                ref_feats, _ = extract(ref_imgs)
                ref_stats = compute_feature_stats(ref_feats)
                if args.ref_stats:
                    save_stats(args.ref_stats, *ref_stats)
        # One extract over the flattened (members*n, H, W, C) stack: the
        # Inception forward batches across members (fewer, larger device
        # dispatches — the per-member loop was relay-latency-bound), then
        # the features split back per member for the FID/IS math.
        nm, ns = samples3.shape[0], samples3.shape[1]
        feats_all, logits_all = extract(samples3.reshape((nm * ns,) + samples3.shape[2:]))
        fid_vals, is_vals = [], []
        for m in range(nm):
            feats = feats_all[m * ns:(m + 1) * ns]
            logits = logits_all[m * ns:(m + 1) * ns]
            fid_vals.append(
                calculate_fid_from_features(feats, ref_stats=ref_stats)
                if ref_stats is not None else None
            )
            is_vals.append(inception_score_from_logits(logits)[0])
        scoring_time = time.time() - t_start
        print(
            f"scored {len(seeds)} members in {scoring_time:.1f}s "
            f"(fid={[None if v is None else round(v, 3) for v in fid_vals]})"
        )

    for m, seed in enumerate(seeds):
        remaining_idx, removed_idx = removals[m]
        model_dir = model_output_dir(
            args.outdir, args.dataset, args.method, args.removal_dist, seed,
            args.datamodel_alpha if args.removal_dist == "datamodel" else None,
        )
        save_removal_indices(model_dir, remaining_idx, removed_idx)
        if args.save_ckpts:
            # The device->host pull of the member's full state lives inside
            # this branch: it is the dominant per-member cost on a remote
            # relay and pure waste when only the DB row is wanted.
            member_state = jax.tree_util.tree_map(
                np.asarray, unstack_state(state, m)
            )
            save_checkpoint(
                model_dir, training_steps, member_state, remaining_idx,
                removed_idx, train_time / len(seeds), unet_spec=spec,
            )
        row = provenance_row(
            args,
            removal_seed=seed,
            loss=float(losses[m]),
            eval_loss=float(eval_losses[m]) if eval_losses is not None else None,
            fid_value=(
                float(fid_vals[m])
                if fid_vals is not None and fid_vals[m] is not None else None
            ),
            **{"is": float(is_vals[m]) if is_vals is not None else None},
            remaining_idx=remaining_idx,
            removed_idx=removed_idx,
            total_steps_time=train_time / len(seeds),
            sampling_time=sample_time / max(len(seeds), 1),
            scoring_time=scoring_time / max(len(seeds), 1),
            model_dir=model_dir,
        )
        append_record(db, row)
    print(f"{len(seeds)} members -> {db}")


if __name__ == "__main__":
    main()
