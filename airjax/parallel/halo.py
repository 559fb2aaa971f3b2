"""Sharded overlap-save decode: the ring-attention analogue for this workload.

A continuous IQ stream is sharded along time across the mesh; a Mode S
window is 240 samples, so each shard needs the first 239 magnitudes of its
right neighbor to scan every offset it owns. That halo moves over ICI with a
single `jax.lax.ppermute` (ring shift by one), after which every device
scans its own `B` offsets — every global offset is scanned exactly once, so
no dedupe is needed and no frame is ever lost at a shard boundary (the class
of bug the reference demonstrably has at its 20,000-sample chunk edges,
src/adsb.rs:75-89).

The last shard receives the *first* shard's head as its halo (ring
wraparound); offsets whose window would run past the true end of the capture
are masked out with the static capture length, matching the reference's scan
bound `len - 240` (src/adsb.rs:98).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from airjax.dsp.demod import WINDOW
from airjax.dsp.magnitude import magnitude_u16
from airjax.parallel.mesh import TIME_AXIS
from airjax.pipeline import decode_mags_block

HALO = WINDOW - 1  # 239


def build_sharded_decoder(
    mesh: Mesh,
    n_samples: int,
    capacity_per_shard: int,
    axis: str = TIME_AXIS,
):
    """Build a jitted sharded decode step for captures of `n_samples`.

    The returned callable maps a ({n_samples}, 2) int16 IQ array (sharded or
    not — input sharding is constrained inside) to a dict of *global* arrays:
      offsets (D*K,) int32 global sample offsets (invalid slots = n_samples)
      good    (D*K,) bool
      recovered (D*K,) bool
      frames  (D*K, 14) uint8
      n_detections, n_good () int32 (summed over shards)

    `n_samples` must divide evenly by the mesh size (pad on host).
    """
    n_dev = mesh.shape[axis]
    if n_samples % n_dev != 0:
        raise ValueError(f"n_samples {n_samples} not divisible by mesh size {n_dev}")
    block = n_samples // n_dev
    if block < HALO:
        raise ValueError(f"per-shard block {block} smaller than halo {HALO}")
    max_offset = n_samples - WINDOW  # last scannable global offset
    perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def local_step(iq_local: jnp.ndarray) -> dict[str, jnp.ndarray]:
        # iq_local: (block, 2) int16 on each device
        mags = magnitude_u16(iq_local)  # (block,)
        halo = jax.lax.ppermute(mags[:HALO], axis, perm)  # right nbr's head
        ext = jnp.concatenate([mags, halo])  # (block + 239,)
        res = decode_mags_block(ext, block, capacity_per_shard)
        base = jax.lax.axis_index(axis).astype(jnp.int32) * block
        global_offsets = res["offsets"] + base
        in_range = res["valid"] & (global_offsets <= max_offset)
        return {
            "offsets": jnp.where(in_range, global_offsets, n_samples),
            "good": res["good"] & in_range,
            "recovered": res["recovered"] & in_range,
            "frames": res["frames"],
            "n_detections": res["n_detections"][None],
            "n_good": jnp.sum(res["good"] & in_range, dtype=jnp.int32)[None],
            "overflow": res["overflow"][None],
        }

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=PartitionSpec(axis, None),
        out_specs={
            "offsets": PartitionSpec(axis),
            "good": PartitionSpec(axis),
            "recovered": PartitionSpec(axis),
            "frames": PartitionSpec(axis, None),
            "n_detections": PartitionSpec(axis),
            "n_good": PartitionSpec(axis),
            "overflow": PartitionSpec(axis),
        },
    )

    in_sharding = NamedSharding(mesh, PartitionSpec(axis, None))

    @jax.jit
    def step(iq: jnp.ndarray):
        iq = jax.lax.with_sharding_constraint(iq, in_sharding)
        out = sharded(iq)
        return {
            "offsets": out["offsets"],
            "good": out["good"],
            "recovered": out["recovered"],
            "frames": out["frames"],
            "n_detections": jnp.sum(out["n_detections"]),
            "n_good": jnp.sum(out["n_good"]),
            "overflow": jnp.any(out["overflow"]),
        }

    return step


def decode_capture_sharded(
    iq,
    mesh: Mesh,
    capacity_per_shard: int = 256,
    axis: str = TIME_AXIS,
):
    """Host convenience: pad, run the sharded decoder, collect ordered hits.

    Returns (hits, stats); hits are (0, global_offset, frame_bytes,
    recovered) tuples sorted by offset — the same schema as
    airjax.pipeline.decode_capture_overlap.
    """
    import numpy as np

    from airjax.pipeline import pad_iq_non_detecting

    n_dev = mesh.shape[axis]
    n = len(iq)
    padded_len = -(-n // n_dev) * n_dev
    block = padded_len // n_dev
    arr = pad_iq_non_detecting(np.asarray(iq, dtype=np.int16), padded_len)
    iq_dev = jnp.asarray(arr)
    step = build_sharded_decoder(mesh, padded_len, capacity_per_shard, axis)
    out = jax.device_get(step(iq_dev))
    # Adaptive regrow on per-shard capacity overflow — a detection storm in
    # one shard must not silently truncate hits.
    while bool(out["overflow"]) and capacity_per_shard < block:
        capacity_per_shard = min(capacity_per_shard * 4, block)
        step = build_sharded_decoder(mesh, padded_len, capacity_per_shard, axis)
        out = jax.device_get(step(iq_dev))

    max_offset = n - WINDOW
    hits = []
    for k in np.nonzero(out["good"])[0]:
        off = int(out["offsets"][k])
        if off <= max_offset:
            hits.append(
                (0, off, out["frames"][k].tobytes(), bool(out["recovered"][k]))
            )
    hits.sort(key=lambda h: h[1])
    stats = {
        "n_detections": int(out["n_detections"]),
        "n_good": int(out["n_good"]),
        "overflow": bool(out["overflow"]),
    }
    return hits, stats
