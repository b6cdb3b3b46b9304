"""On-chip check + microbenchmark of the fused GroupNorm+SiLU Pallas kernel.

Correctness: pallas vs the XLA reference path (fwd and grads) on the real
TPU at bench shapes. Speed: fwd+bwd wall time of a GN+SiLU+conv3x3 chain
under the ensemble vmap, XLA vs Pallas, at the CIFAR bench shapes.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from group_attribution_for_diffusion_models_tpu.ops.group_norm import (
    _gn_silu_pallas,
    _xla_group_norm_silu,
)

M, B = 8, 64  # members x batch


def check(shape, groups):
    kx, kg, kb, kc = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(kx, shape, jnp.float32) * 2 + 0.3
    gamma = jax.random.normal(kg, (shape[-1],)) + 1.0
    beta = jax.random.normal(kb, (shape[-1],))
    cot = jax.random.normal(kc, shape)
    x3 = x.reshape(shape[0], -1, shape[-1])
    cot3 = cot.reshape(x3.shape)

    def lp(x3, g, b):
        return jnp.sum(
            _gn_silu_pallas(x3, g, b, groups, 1e-6, True, jnp.float32, False) * cot3
        )

    def lx(x, g, b):
        return jnp.sum(
            _xla_group_norm_silu(x, g, b, groups, 1e-6, True, jnp.float32)
            * cot
        )

    vp, gp = jax.value_and_grad(lp, argnums=(0, 1, 2))(x3, gamma, beta)
    vx, gx = jax.value_and_grad(lx, argnums=(0, 1, 2))(x, gamma, beta)
    errs = [float(jnp.max(jnp.abs(a.reshape(b.shape) - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
            for a, b in zip(gp, [gx[0].reshape(x3.shape), gx[1], gx[2]])]
    print(f"check {shape} g={groups}: val rel "
          f"{abs(float(vp - vx)) / (abs(float(vx)) + 1e-9):.2e} "
          f"grad rel {['%.2e' % e for e in errs]}")


def bench_chain(hw, c, groups, fused, steps=20):
    """vmapped (members) GN+SiLU -> conv3x3 -> GN+SiLU -> conv3x3, fwd+bwd."""
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (M, B, hw, hw, c), jnp.bfloat16)
    gamma = jnp.ones((M, c)); beta = jnp.zeros((M, c))
    w = jax.random.normal(key, (M, 3, 3, c, c), jnp.bfloat16) * 0.02

    def gn(x, g, b):
        if fused:
            x3 = x.reshape(x.shape[0], -1, c)
            y = _gn_silu_pallas(x3, g, b, groups, 1e-6, True, jnp.bfloat16, False)
            return y.reshape(x.shape)
        return _xla_group_norm_silu(x, g, b, groups, 1e-6, True, jnp.bfloat16)

    def member(x, g, b, w):
        def loss(w):
            h = gn(x, g, b)
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = gn(h, g, b)
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(h.astype(jnp.float32) ** 2)
        return jax.grad(loss)(w)

    f = jax.jit(jax.vmap(member))
    out = f(x, gamma, beta, w); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = f(x, gamma, beta, w)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / steps * 1e3
    return dt


def main():
    print("backend:", jax.default_backend())
    check((16, 32, 32, 128), 32)
    check((16, 16, 16, 256), 32)
    check((4, 32, 32, 320), 32)
    for hw, c in [(32, 128), (16, 256), (8, 256)]:
        t_x = bench_chain(hw, c, 32, fused=False)
        t_p = bench_chain(hw, c, 32, fused=True)
        print(f"chain {M}x{B}x{hw}x{hw}x{c}: xla {t_x:.2f} ms  pallas {t_p:.2f} ms  "
              f"speedup {t_x / t_p:.2f}x")


if __name__ == "__main__":
    main()
