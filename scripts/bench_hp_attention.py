"""On-chip microbench: head-packed vs transposed-layout flash attention.

Compares fwd and fwd+bwd wall time at the miniSD attention geometries,
including the XLA relayout cost that surrounds each kernel in the real
model (inputs arrive in the projections' natural (B, S, H*D) layout).
Run on the TPU: python scripts/bench_hp_attention.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from group_attribution_for_diffusion_models_tpu.ops.attention import (
    flash_attention,
    flash_attention_hp,
)


def timed(fn, *args, iters=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else None
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("backend:", jax.default_backend(), jax.devices())
    shapes = [
        (2, 4096, 8, 40),   # miniSD level-0 self-attn
        (2, 1024, 8, 80),   # level-1
        (4, 4096, 8, 40),
        (2, 4096, 8, 40, 77),  # cross-attn vs 77 text tokens
    ]
    for spec in shapes:
        b, s, h, d = spec[:4]
        skv = spec[4] if len(spec) > 4 else s
        rng = np.random.default_rng(0)
        # Natural packed layout as produced by the qkv projections.
        qp = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
        kp = jnp.asarray(rng.standard_normal((b, skv, h * d)), jnp.bfloat16)
        vp = jnp.asarray(rng.standard_normal((b, skv, h * d)), jnp.bfloat16)

        def split(x):
            return x.reshape(x.shape[0], x.shape[1], h, d)

        @jax.jit
        def fwd_t(q, k, v):
            return flash_attention(split(q), split(k), split(v)).reshape(q.shape)

        @jax.jit
        def fwd_hp(q, k, v):
            return flash_attention_hp(split(q), split(k), split(v)).reshape(q.shape)

        def loss_t(q, k, v):
            return jnp.sum(flash_attention(split(q), split(k), split(v)).astype(jnp.float32) ** 2)

        def loss_hp(q, k, v):
            return jnp.sum(flash_attention_hp(split(q), split(k), split(v)).astype(jnp.float32) ** 2)

        grad_t = jax.jit(jax.grad(loss_t, argnums=(0, 1, 2)))
        grad_hp = jax.jit(jax.grad(loss_hp, argnums=(0, 1, 2)))

        # numerics
        o_t = np.asarray(fwd_t(qp, kp, vp), np.float32)
        o_hp = np.asarray(fwd_hp(qp, kp, vp), np.float32)
        err_f = np.max(np.abs(o_t - o_hp))
        g_t = grad_t(qp, kp, vp)
        g_hp = grad_hp(qp, kp, vp)
        err_b = max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32) - b2.astype(jnp.float32))))
            for a, b2 in zip(g_t, g_hp)
        )

        ms_ft = timed(fwd_t, qp, kp, vp)
        ms_fhp = timed(fwd_hp, qp, kp, vp)
        ms_bt = timed(grad_t, qp, kp, vp)
        ms_bhp = timed(grad_hp, qp, kp, vp)
        print(
            f"B{b} S{s} H{h} D{d} Skv{skv}: fwd t={ms_ft:.3f}ms hp={ms_fhp:.3f}ms "
            f"({ms_ft/ms_fhp:.2f}x) | fwd+bwd t={ms_bt:.3f}ms hp={ms_bhp:.3f}ms "
            f"({ms_bt/ms_bhp:.2f}x) | max|dF|={err_f:.4f} max|dG|={err_b:.4f}"
        )


if __name__ == "__main__":
    main()
