"""On-chip microbench: attention layout/kernel dispatch over the REAL shape grid.

Three contenders at every (B, Sq, H, D, Skv) the registry's models actually
hit (config/registry.py: CIFAR/celeba/miniSD/imagenette geometries, self- and
cross-attention, at the bench batch sizes):

  * xla — jax.nn.dot_product_attention (the XLA fused path)
  * t   — ops.attention.flash_attention (transposed layout (B*H, D, S))
  * hp  — ops.attention.flash_attention_hp (head-packed (B, S, H*D); needs
          Sq % 256 == 0)

All contenders are fed from the projections' natural packed (B, S, H*D)
layout so each kernel pays its own real relayout cost, exactly as inside the
model. Measures fwd and fwd+bwd, checks numerics between all pairs, prints a
markdown table, and writes docs/attn_dispatch_table.json — the measured
source of truth for `dot_product_attention`'s dispatch rule.

Run on the TPU: python scripts/bench_hp_attention.py
Env: ATTN_BENCH_ITERS (default 30), ATTN_BENCH_SMOKE=1 for a tiny CPU grid.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from group_attribution_for_diffusion_models_tpu.ops.attention import (
    _xla_attention,
    flash_attention,
    flash_attention_hp,
)

ITERS = int(os.environ.get("ATTN_BENCH_ITERS", "30"))


# (B, Sq, H, D, Skv, note) — B is the real members*batch of the bench/CLI
# configs, capped where the score matrix would blow 16 GB for the XLA path.
def real_shape_grid():
    return [
        # CIFAR DDPM (bench.py: 8 members x batch 64), single-head d=256
        # level-1 self-attn at 16x16 tokens.
        (512, 256, 1, 256, 256, "cifar l1"),
        # celeba 64px latents (batch 32), head dim 32: levels 1-3 + mid.
        (32, 1024, 14, 32, 1024, "celeba l1"),
        (32, 256, 21, 32, 256, "celeba l2"),
        (32, 64, 28, 32, 64, "celeba l3/mid"),
        # miniSD / imagenette LDM 32x32 latents (bench_sd: 4 members x
        # batch 64), 8 heads, d = 40/80/160 at S = 1024/256/64.
        (256, 1024, 8, 40, 1024, "sd l0 self"),
        (256, 256, 8, 80, 256, "sd l1 self"),
        (256, 64, 8, 160, 64, "sd l2/mid self"),
        (256, 1024, 8, 40, 77, "sd l0 cross"),
        (256, 256, 8, 80, 77, "sd l1 cross"),
        (256, 64, 8, 160, 77, "sd l2 cross"),
        # Larger-latent variants (512px -> 64x64): the shapes the round-3
        # rule was derived from, kept for continuity.
        (8, 4096, 8, 40, 4096, "sd64 l0 self"),
        (8, 1024, 8, 80, 1024, "sd64 l1 self"),
        (8, 4096, 8, 40, 77, "sd64 l0 cross"),
    ]


def smoke_shape_grid():
    return [(2, 256, 2, 32, 256, "smoke self"), (2, 256, 2, 32, 77, "smoke cross")]


def timed(fn, *args, iters=ITERS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from group_attribution_for_diffusion_models_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    print("backend:", jax.default_backend(), jax.devices())
    smoke = bool(os.environ.get("ATTN_BENCH_SMOKE"))
    grid = smoke_shape_grid() if smoke else real_shape_grid()
    rows = []
    for b, s, h, d, skv, note in grid:
        rng = np.random.default_rng(0)
        # Natural packed layout as produced by the qkv projections.
        qp = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
        kp = jnp.asarray(rng.standard_normal((b, skv, h * d)), jnp.bfloat16)
        vp = jnp.asarray(rng.standard_normal((b, skv, h * d)), jnp.bfloat16)

        def split(x, sl):
            return x.reshape(x.shape[0], sl, h, d)

        def make(kernel):
            @jax.jit
            def fwd(q, k, v):
                return kernel(
                    split(q, s), split(k, skv), split(v, skv)
                ).reshape(q.shape)

            def loss(q, k, v):
                return jnp.sum(fwd(q, k, v).astype(jnp.float32) ** 2)

            return fwd, jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        impls = {"xla": make(_xla_attention), "t": make(flash_attention)}
        if s % 256 == 0:
            impls["hp"] = make(flash_attention_hp)

        outs, grads, res = {}, {}, {}
        for name, (fwd, grad) in impls.items():
            outs[name] = np.asarray(fwd(qp, kp, vp), np.float32)
            grads[name] = grad(qp, kp, vp)
            res[name] = {
                "fwd_ms": round(timed(fwd, qp, kp, vp), 3),
                "fwdbwd_ms": round(timed(grad, qp, kp, vp), 3),
            }
        err_f = max(
            float(np.max(np.abs(outs["xla"] - o)))
            for n, o in outs.items() if n != "xla"
        )
        err_b = max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32) - g.astype(jnp.float32))))
            for n in impls if n != "xla"
            for a, g in zip(grads["xla"], grads[n])
        )
        row = {
            "B": b, "Sq": s, "H": h, "D": d, "Skv": skv, "note": note,
            "impls": res,
            "fwd_winner": min(res, key=lambda n: res[n]["fwd_ms"]),
            "fwdbwd_winner": min(res, key=lambda n: res[n]["fwdbwd_ms"]),
            "max_abs_err_fwd_vs_xla": round(err_f, 5),
            "max_abs_err_bwd_vs_xla": round(err_b, 5),
        }
        rows.append(row)
        cells = " ".join(
            f"{n}:{v['fwd_ms']}/{v['fwdbwd_ms']}" for n, v in res.items()
        )
        print(
            f"B{b:4d} S{s:5d} H{h:2d} D{d:3d} Skv{skv:5d} [{note:13s}] "
            f"{cells}  -> fwd={row['fwd_winner']} bwd={row['fwdbwd_winner']} "
            f"errF={err_f:.4f} errB={err_b:.4f}"
        )

    out_path = os.path.join(
        os.path.dirname(__file__), "..", "docs", "attn_dispatch_table.json"
    )
    if not smoke:
        with open(os.path.abspath(out_path), "w") as f:
            json.dump(
                {"backend": jax.default_backend(), "iters": ITERS, "rows": rows},
                f, indent=1,
            )
        print(f"wrote {os.path.abspath(out_path)}")


if __name__ == "__main__":
    main()
