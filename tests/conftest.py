"""Test config: force the CPU backend with 8 virtual devices so
sharding/halo logic is testable without TPU hardware (SURVEY.md §4c).

The environment's sitecustomize registers an `axon` TPU backend and pins
`jax_platforms="axon,cpu"` at interpreter start, so env vars alone are not
enough — we override via jax.config before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
