"""Device mesh helpers.

The reference has no distributed computing at all (SURVEY.md §2.4) — its
parallelism is three OS threads and mpsc channels. Here the time axis of the
IQ stream is sharded over a 1-D `Mesh` (ICI within a slice, DCN across
hosts), and decoded-candidate gathers ride XLA collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

TIME_AXIS = "t"


def make_mesh(n_devices: int | None = None, axis: str = TIME_AXIS) -> Mesh:
    """1-D mesh over the first `n_devices` local devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def time_sharding(mesh: Mesh, axis: str = TIME_AXIS) -> NamedSharding:
    """Shard the leading (time/block) axis, replicate the rest."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def init_distributed() -> None:
    """Multi-host initialization (jax.distributed); no-op when single-host.

    Call before any other JAX API in a multi-host launch. Coordinator
    address/process ids come from the environment (TPU pod metadata), per
    standard jax.distributed.initialize() discovery.
    """
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # Single-process: nothing to do.
        pass
