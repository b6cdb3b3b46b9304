"""Train / retrain / prune-fine-tune / unlearn a diffusion model on a removal subset.

CLI mirror of reference unconditional_generation/main.py (args :37-203, loop
:654-845) rebuilt on the TPU runtime: the hot loop is the jitted train step
(antithetic timesteps, EMA, clip), sampling is the compiled lax.scan DDIM
sampler, checkpoints are orbax TrainState saves carrying removal indices and
timing, and completion appends the standard JSONL provenance row.

Usage (smoke):
    python -m group_attribution_for_diffusion_models_tpu.cli.main \
        --dataset synthetic_64x8 --method retrain --removal_dist shapley \
        --removal_seed 0 --outdir /tmp/out --training_steps 10
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..config import constants
from ..data import create_dataset, batch_iterator
from ..diffusion import make_schedule

from ..models import UNet2D
from ..training import TrainState, make_optimizer, make_train_step
from ..utils import append_record
from ..utils.ckpt import (
    load_checkpoint,
    load_unet_spec,
    resume_or_init,
    save_checkpoint,
)
from .common import (
    add_common_args,
    config_for,
    model_output_dir,
    provenance_row,
    save_removal_indices,
    setup_removal,
    tracker_for,
)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--method", type=str, default="retrain",
                        choices=constants.METHOD)
    parser.add_argument("--load", type=str, default=None,
                        help="model dir of a pretrained ckpt to start from")
    parser.add_argument("--pruned_model_dir", type=str, default=None,
                        help="model dir of a pruned ckpt (prune_fine_tune)")
    parser.add_argument("--training_steps", type=int, default=None,
                        help="override the config's per-method budget")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--ckpt_freq", type=int, default=None)
    parser.add_argument("--sample_freq", type=int, default=None)
    parser.add_argument("--log_freq", type=int, default=100)
    parser.add_argument("--ema_max_decay", type=float, default=0.9999)
    parser.add_argument("--ema_power", type=float, default=0.75)
    parser.add_argument("--no_antithetic", action="store_true", default=False)
    parser.add_argument(
        "--scan_chunk", type=int, default=0,
        help="on-device fast path: keep the subset resident and lax.scan up "
        "to N train steps per dispatch (chunks break at log/sample/ckpt "
        "boundaries). Per-step noise/timestep keys match the default loop "
        "exactly; batch selection becomes uniform-with-replacement on "
        "device instead of host-side shuffled epochs (statistically "
        "equivalent, not bit-identical); conditional runs gather their "
        "class caption embeddings on device too. "
        "0 = per-step dispatch (reference-faithful default).",
    )
    parser.add_argument("--keep_all_ckpts", action="store_true", default=False)
    parser.add_argument("--precompute_stage", type=str, default="reuse",
                        choices=["none", "save", "reuse"],
                        help="VQ-VAE latent precompute mode for LDM datasets "
                             "(reference main.py:490-546)")
    parser.add_argument("--text_encoder_kind", type=str, default="ldm_bert",
                        choices=["ldm_bert", "clip"],
                        help="conditional text tower: 'ldm_bert' is the "
                             "reference's imagenette encoder (pipeline.bert "
                             "of ldm-text2im-large-256, src/diffusion_utils"
                             ".py:215-223); 'clip' keeps the CLIP substitute")
    parser.add_argument("--text_encoder_weights", type=str, default=None,
                        help="converted text-encoder params (.npz from "
                             "cli.convert_weights ldm_bert / clip_text, or a "
                             "torch state-dict file) for conditional datasets")
    parser.add_argument("--tokenizer_dir", type=str, default=None,
                        help="dir with CLIP vocab.json + merges.txt for the "
                             "real BPE tokenizer (required with "
                             "--text_encoder_weights: hash-tokenized ids "
                             "would index real embeddings arbitrarily)")
    parser.add_argument("--random_text_encoder", action="store_true",
                        default=False,
                        help="explicitly allow a randomly initialized text "
                             "encoder (smoke tests only — prompt "
                             "conditioning is meaningless without real "
                             "weights)")
    parser.add_argument("--n_inference_samples", type=int, default=None,
                        help="images per in-training EMA sample grid "
                             "(default min(config n_samples, 16))")
    return parser.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    args = parse_args(argv)
    cfg = config_for(args.dataset)
    method_key = "gd" if args.method in ("gd_u", "ga_u") else args.method
    method_base = {"ga": "ga", "ga_u": "ga"}.get(args.method, method_key)

    training_steps = args.training_steps or cfg.train.training_steps.get(
        method_base, 1000
    )
    batch_size = args.batch_size or cfg.train.batch_size
    # --ckpt_freq 0 suppresses INTERMEDIATE checkpoints only: the final one
    # is still written (the `or step_i == training_steps` clause in the
    # train loop) because the trained model is the run's product — every
    # downstream consumer (attribute.py --load, unlearn --load, the sketch
    # pipeline) resolves it via get_max_steps. This is deliberately
    # asymmetric with --sample_freq 0, which truly means "never sample".
    ckpt_freq = (
        args.ckpt_freq if args.ckpt_freq is not None
        else cfg.train.ckpt_freq.get(method_base, 10000)
    )

    model_dir = model_output_dir(
        args.outdir, args.dataset, args.method, args.removal_dist,
        args.removal_seed, args.datamodel_alpha if args.removal_dist == "datamodel" else None,
    )
    os.makedirs(model_dir, exist_ok=True)

    dataset = create_dataset(args.dataset, train=True)
    remaining_idx, removed_idx = setup_removal(args, dataset)
    save_removal_indices(model_dir, remaining_idx, removed_idx)
    # Gradient ascent unlearns ON the removed subset (reference main.py:298-300).
    train_idx = removed_idx if args.method in ("ga", "ga_u") else remaining_idx
    if len(train_idx) == 0:
        raise SystemExit("empty training subset; nothing to do")
    subset = dataset.subset(train_idx)

    # LDM workloads (celeba): diffuse in VQ-VAE latent space. The one-time
    # full-dataset encode caches to precomputed_emb/ keyed by dataset order
    # (reference main.py:490-546).
    if cfg.vqvae is not None:
        from ..models.vqvae import load_vqvae, precompute_latents

        vqvae, vq_vars = load_vqvae(cfg.vqvae, args.vqvae_weights)
        cache = (
            os.path.join(args.outdir, args.dataset, "precomputed_emb",
                         "vqvae_latents.npy")
            if args.precompute_stage in ("save", "reuse")
            else None
        )
        latents = precompute_latents(
            vqvae, vq_vars, dataset.images, batch_size=32, cache_path=cache
        )
        latents = latents * cfg.vqvae.scaling_factor
        from ..data.datasets import ArrayDataset

        subset = ArrayDataset(latents[train_idx], dataset.labels[train_idx])

    spec = cfg.unet
    if args.pruned_model_dir or args.method == "prune_fine_tune":
        src = args.pruned_model_dir or model_output_dir(
            args.outdir, args.dataset, "prune", "full"
        )
        # Pruned arch travels as spec inside ckpt meta.
        probe_model = UNet2D(spec)
        probe = probe_model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.unet.sample_size, cfg.unet.sample_size, cfg.unet.in_channels)),
            jnp.zeros((1,), jnp.int32),
        )["params"]
        tx_probe = make_optimizer(cfg.train.optimizer.name, lr=1e-4)
        _, meta = load_checkpoint(src, TrainState.create(probe, tx_probe))
        loaded_spec = load_unet_spec(meta)
        if loaded_spec is not None:
            spec = loaded_spec

    model = UNet2D(spec)
    x0 = jnp.zeros((1, spec.sample_size, spec.sample_size, spec.in_channels))
    t0 = jnp.zeros((1,), jnp.int32)
    init_args = (x0, t0) + (
        (jnp.zeros((1, 77, spec.cross_attention_dim)),) if spec.conditional else ()
    )
    params = model.init(jax.random.PRNGKey(args.opt_seed), *init_args)["params"]

    opt = cfg.train.optimizer
    tx = make_optimizer(
        opt.name,
        lr=args.lr or opt.lr,
        weight_decay=opt.weight_decay,
        grad_clip_norm=opt.grad_clip_norm,
        maximize=args.method in ("ga", "ga_u"),
    )
    init_state = TrainState.create(params, tx)

    # Start point: resume > pruned/pretrained load > random init
    # (reference main.py:334-424).
    state, meta, resumed = resume_or_init(model_dir, init_state)
    if not resumed and (args.load or args.pruned_model_dir):
        src = args.pruned_model_dir or args.load
        state, meta = load_checkpoint(src, init_state)
        state = TrainState.create(state.params, tx)  # EMA restarts from loaded params
        print(f"loaded pretrained params from {src}")
    start_step = int(np.asarray(state.step))
    total_steps_time = float(meta.get("total_steps_time", 0.0))

    schedule = make_schedule(cfg.scheduler)
    train_step_fn = make_train_step(
        model.apply, tx, schedule, cfg.scheduler,
        conditional=spec.conditional,
        ema_max_decay=args.ema_max_decay, ema_power=args.ema_power,
        use_antithetic=not args.no_antithetic,
    )
    step_fn = jax.jit(train_step_fn)

    # Conditional workloads (imagenette LDM text-to-image): per-class caption
    # embeddings via the captioner + CLIP text tower, indexed by batch label
    # (reference main.py:666-670 captioner/text_encoder path).
    class_emb = None
    if spec.conditional:
        from ..pipelines import ImagenetteCaptioner

        captioner = ImagenetteCaptioner()
        width = spec.cross_attention_dim
        if args.text_encoder_kind == "ldm_bert":
            # The reference's imagenette pipeline conditions on the LDMBert
            # encoder of CompVis/ldm-text2im-large-256 (pipeline.bert,
            # reference src/diffusion_utils.py:215-223). Full-size spec at
            # the real cross-attention width; a shrunk 2-layer tower for
            # smoke-size synthetic conditional configs.
            from ..models.ldm_bert import LDMBertEncoder, load_ldm_bert

            text = LDMBertEncoder(
                d_model=width,
                layers=32 if width >= 1280 else 2,
                num_heads=8,
                head_dim=64 if width >= 1280 else max(width // 8, 4),
                ffn_dim=width * 4,
            )
            text_loader = load_ldm_bert
        else:
            from ..models.clip_text import CLIPTextEncoder, load_clip_text

            text = CLIPTextEncoder(
                width=width,
                layers=12 if width >= 768 else 2,
                heads=12 if width % 12 == 0 else max(width // 16, 1),
            )
            text_loader = load_clip_text
        if args.text_encoder_weights:
            from .common import validated_text_params

            text_params = validated_text_params(
                text, args.text_encoder_weights, loader=text_loader
            )
            print(f"loaded text encoder weights from {args.text_encoder_weights}")
        elif args.random_text_encoder:
            print(
                "WARNING: conditional training with a RANDOM text encoder — "
                "prompt conditioning carries no semantics (smoke mode)",
                flush=True,
            )
            text_params = text.init(
                jax.random.PRNGKey(11), jnp.zeros((1, 77), jnp.int32)
            )["params"]
        else:
            raise SystemExit(
                f"dataset {args.dataset!r} is prompt-conditional: pass "
                "--text_encoder_weights <converted .npz / torch state dict> "
                "(see cli.convert_weights ldm_bert / clip_text), or opt in "
                "to a random encoder with --random_text_encoder"
            )
        if args.text_encoder_weights and not args.tokenizer_dir:
            raise SystemExit(
                "--text_encoder_weights needs --tokenizer_dir "
                "(vocab.txt for ldm_bert, vocab.json + merges.txt for clip): "
                "hash-tokenized prompts would index the real embedding "
                "table with arbitrary ids"
            )
        if args.text_encoder_kind == "ldm_bert" and args.tokenizer_dir:
            # The LDM text2im pipeline tokenizes with an uncased
            # BertTokenizer (WordPiece over vocab.txt), not CLIP BPE.
            from ..models.bert_tokenizer import BertWordPieceTokenizer

            tokenize = BertWordPieceTokenizer.from_dir(args.tokenizer_dir)
        else:
            from ..models.clip_text import load_tokenizer

            tokenize = load_tokenizer(args.tokenizer_dir)
        n_cls = max(int(dataset.labels.max()) + 1, 1)
        prompts = captioner(
            [i % captioner.num_classes for i in range(n_cls)]
        )
        class_emb = jnp.asarray(
            text.apply({"params": text_params}, jnp.asarray(tokenize(prompts)))
        )

    # In-training EMA inference hook (reference main.py:773-788): every
    # sample_freq steps, DDIM-sample a small grid from the EMA params and
    # save it under <model_dir>/samples/.
    # `0` must mean "never sample", not "fall back to the config default" —
    # mass pipeline runs pass it to keep the hot loop free of DDIM grids.
    sample_freq = (
        args.sample_freq if args.sample_freq is not None
        else cfg.train.sample_freq.get(method_base, 0)
    )
    sampling_time = 0.0

    # The grid sampler is built (and its decode_fn loaded) once and jitted,
    # so each sampling event reuses one compiled executable instead of
    # re-reading VQ weights and re-tracing the 100-step scan.
    _grid_sampler = None

    def save_sample_grid(state, step):
        from PIL import Image

        from ..diffusion.sampling import sample_loop
        from .common import vq_decode_fn_for

        nonlocal _grid_sampler
        n_s = args.n_inference_samples or min(cfg.train.n_samples or 16, 16)
        if _grid_sampler is None:
            shape = (n_s, spec.sample_size, spec.sample_size, spec.in_channels)
            ehs_s = (
                class_emb[np.arange(n_s) % class_emb.shape[0]]
                if class_emb is not None
                else None
            )
            decode = (
                vq_decode_fn_for(cfg, args.vqvae_weights)
                if cfg.vqvae is not None
                else None
            )
            _grid_sampler = jax.jit(
                lambda params, key: sample_loop(
                    model.apply, params, schedule, cfg.scheduler, shape, key,
                    num_inference_steps=100, kind="ddim",
                    encoder_hidden_states=ehs_s, decode_fn=decode,
                )
            )
        imgs = np.asarray(
            _grid_sampler(state.ema_params, jax.random.PRNGKey(1_000_000 + step))
        )
        cols = min(n_s, 4)
        rows = -(-n_s // cols)
        h, w, c = imgs.shape[1:]
        grid = np.zeros((rows * h, cols * w, c), np.float32)
        for i, im in enumerate(imgs):
            r, col = divmod(i, cols)
            grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = im
        arr = (np.clip(grid, 0, 1) * 255).round().astype(np.uint8)
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
        os.makedirs(os.path.join(model_dir, "samples"), exist_ok=True)
        path = os.path.join(model_dir, "samples", f"steps_{step:08d}.png")
        Image.fromarray(arr).save(path)
        print(f"saved EMA sample grid: {path}", flush=True)

    batches = batch_iterator(subset, min(batch_size, len(subset)), seed=args.opt_seed)
    tracker = tracker_for(args, f"{args.dataset}_{args.method}")

    from ..utils.profiling import trace

    use_scan = bool(args.scan_chunk)

    def log_metrics(metrics, step, t_start):
        el = time.time() - t_start
        print(
            f"Step[{step}/{training_steps}] loss={float(metrics['loss']):.5f} "
            f"grad_norm={float(metrics['grad_norm']):.4f} "
            f"steps_time={el:.1f}s",
            flush=True,
        )
        tracker.log(
            {"loss": float(metrics["loss"]),
             "grad_norm": float(metrics["grad_norm"]),
             "steps_time": el},
            step,
        )

    t_start = time.time()
    metrics = {}
    if use_scan:
        # On-device fast path: the subset stays resident, batch indices are
        # drawn on device (uniform with replacement), and up to --scan_chunk
        # steps run per dispatch as a lax.scan — the per-step host round
        # trip and H2D batch copy (the wall on remote-relay backends, and a
        # real tax even locally) disappear. Per-step PRNG keys are the
        # default loop's exact sequence, so noise/timestep draws match;
        # only batch COMPOSITION differs (with-replacement vs host-side
        # shuffled epochs — the ensemble trainer's semantics,
        # parallel/ensemble.py).
        images_dev = jnp.asarray(subset.images)
        labels_dev = jnp.asarray(subset.labels)
        emb_dev = class_emb  # (num_classes, 77, width) or None
        n_sub = len(subset)
        eff_batch = min(batch_size, n_sub)

        def scan_steps(state, seeds, images, labels, emb):
            def body(st, seed):
                key = jax.random.PRNGKey(seed)
                k_b = jax.random.fold_in(key, 0x5CA9)
                idx = jax.random.randint(k_b, (eff_batch,), 0, n_sub)
                ehs = emb[labels[idx]] if emb is not None else None
                return train_step_fn(
                    st, images[idx], key, encoder_hidden_states=ehs
                )

            return jax.lax.scan(body, state, seeds)

        scan_jit = jax.jit(scan_steps, donate_argnums=0)

        with trace(args.profile_dir):
            step_i = start_step
            while step_i < training_steps:
                nxt = training_steps
                for f in (args.log_freq, sample_freq or 0, ckpt_freq):
                    if f:
                        nxt = min(nxt, (step_i // f + 1) * f)
                n = min(nxt - step_i, max(args.scan_chunk, 1))
                seeds = jnp.asarray(
                    [(args.opt_seed * 1_000_003 + s) % (1 << 32)
                     for s in range(step_i, step_i + n)],
                    jnp.uint32,
                )
                state, ms = scan_jit(
                    state, seeds, images_dev, labels_dev, emb_dev
                )
                metrics = {k: v[-1] for k, v in ms.items()}
                step_i += n
                if step_i % args.log_freq == 0 or step_i == training_steps:
                    log_metrics(metrics, step_i, t_start)
                if sample_freq and step_i % sample_freq == 0:
                    t_s = time.time()
                    save_sample_grid(state, step_i)
                    sampling_time += time.time() - t_s
                if (ckpt_freq and step_i % ckpt_freq == 0) or step_i == training_steps:
                    save_checkpoint(
                        model_dir, step_i, state, remaining_idx, removed_idx,
                        total_steps_time + (time.time() - t_start) - sampling_time,
                        unet_spec=spec,
                    )
    else:
        with trace(args.profile_dir):
            for step_i in range(start_step, training_steps):
                images, labels = next(batches)
                ehs = class_emb[jnp.asarray(labels)] if class_emb is not None else None
                state, metrics = step_fn(
                    state, jnp.asarray(images),
                    jax.random.PRNGKey(args.opt_seed * 1_000_003 + step_i),
                    encoder_hidden_states=ehs,
                )
                if (step_i + 1) % args.log_freq == 0 or step_i + 1 == training_steps:
                    log_metrics(metrics, step_i + 1, t_start)
                if sample_freq and (step_i + 1) % sample_freq == 0:
                    t_s = time.time()
                    save_sample_grid(state, step_i + 1)
                    sampling_time += time.time() - t_s
                if (ckpt_freq and (step_i + 1) % ckpt_freq == 0) or step_i + 1 == training_steps:
                    save_checkpoint(
                        model_dir, step_i + 1, state, remaining_idx, removed_idx,
                        total_steps_time + (time.time() - t_start) - sampling_time,
                        unet_spec=spec,
                    )
    total_steps_time += time.time() - t_start - sampling_time
    tracker.finish()

    db = args.db or os.path.join(args.outdir, f"{args.dataset}_train_db.jsonl")
    append_record(
        db,
        provenance_row(
            args,
            loss=float(metrics.get("loss", float("nan"))),
            remaining_idx=remaining_idx,
            removed_idx=removed_idx,
            total_steps_time=total_steps_time,
            sampling_time=sampling_time,
            model_dir=model_dir,
        ),
    )
    print(f"done: {model_dir}")


if __name__ == "__main__":
    main()
