"""Persistent XLA compilation cache.

First compiles of the large scanned programs (SD LoRA ensemble, CIFAR
ensemble train loop) cost minutes through the TPU relay; the reference
pays the equivalent torch.compile/cudagraph warmup per process. Enabling
jax's persistent compilation cache makes every process after the first
start hot: the benchmarks (bench.py / bench_sd.py) and the quality-demo
scripts all funnel through here so a warm-up run in one process speeds
up the next (including the driver's end-of-round bench run).

Must be called before the first jit compilation; safe to call twice.
"""

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at an on-disk compilation cache and drop the size/time
    thresholds so even medium programs are cached. Returns the dir used.

    Honors JAX_COMPILATION_CACHE_DIR if already set (e.g. by the driver);
    otherwise defaults to <repo>/.jax_cache (gitignored).

    Enabled ONLY when the process is explicitly pinned to an accelerator
    platform (tpu / the axon relay): XLA:CPU caches AOT machine code keyed
    looser than the host's exact feature set, and reloading it logs
    SIGILL-risk errors — while CPU compiles of the test-scale programs are
    cheap anyway. The win is the TPU/relay path, where first compiles cost
    minutes. Returns None when skipped.
    """
    import jax

    platforms = (
        jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "") or ""
    ).lower()
    if not any(p in platforms for p in ("tpu", "axon", "cuda", "rocm", "gpu")):
        return None

    cache_dir = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir
