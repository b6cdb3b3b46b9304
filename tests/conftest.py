"""Test configuration: force an 8-virtual-device CPU JAX backend.

The reference never tests distributed behavior without hardware (SURVEY.md §4).
Here every multi-chip code path runs in CI on a virtual 8-device CPU mesh via
XLA's host-platform device-count flag.

Note: this environment's sitecustomize registers a remote TPU backend ("axon")
and imports jax at interpreter startup, so plain env vars are too late — we
set XLA_FLAGS before any backend initializes and pin the platform through
jax.config, which is honored lazily.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
