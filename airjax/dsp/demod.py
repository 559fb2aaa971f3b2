"""Vectorized preamble/DF17 detection and PPM bit-slicing.

The reference scans every sample offset with a scalar early-exit loop
(src/adsb.rs:98-116 -> src/adsb/demod.rs:17-57): an offset is a detection iff

  min(mag[i + h] for h in PREAMBLE_HIGHS) >= max(mag[i + l] for l in LOWS)
  and the same for the 10-sample DF=17 pattern at i+16..i+25,

and a detection's 112 bits come from the "relative" Manchester slicer
(src/adsb/demod.rs:92-131): bit_k = mag[i+16+2k] > mag[i+16+2k+1]. (That
slicer can never reject — a pair compare always yields a valid Manchester
pair — so the CRC is the only filter; the `errors > 2` bail is dead.)

Here the scan is a branch-free array program over all offsets at once:
26 shifted u32 min/max/compare ops per offset on the VPU, then a masked
compaction of detection offsets into a fixed-capacity candidate buffer, then
bit-slicing of just those K candidates. Static shapes throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from airjax.config import PipelineConfig, DEFAULT_CONFIG

# Mode S preamble: highs/lows at half-us sample indices (demod.rs:23-24).
PREAMBLE_HIGHS = (0, 2, 7, 9)
PREAMBLE_LOWS = (1, 3, 4, 5, 6, 8, 10, 11, 12, 13, 14, 15)
# DF=17 pattern `10001` over the next 10 samples (demod.rs:45-46), +16 shift.
DF17_HIGHS = (16, 19, 21, 23, 24)
DF17_LOWS = (17, 18, 20, 22, 25)

WINDOW = 240  # 16 preamble + 224 data samples
DATA_OFFSET = 16
FRAME_SAMPLES = 224
FRAME_BITS = 112


def _shifted(mags: jnp.ndarray, shift: int, n_off: int) -> jnp.ndarray:
    return jax.lax.dynamic_slice_in_dim(mags, shift, n_off, axis=-1)


def detect(mags: jnp.ndarray, n_off: int) -> jnp.ndarray:
    """Detection mask over offsets [0, n_off) of a magnitude block.

    Args:
      mags: (..., L) uint32 magnitudes with L >= n_off + 25.
    Returns:
      (..., n_off) bool, True where the preamble + DF17 checks pass.
    """
    hmin = functools.reduce(
        jnp.minimum, (_shifted(mags, s, n_off) for s in PREAMBLE_HIGHS)
    )
    lmax = functools.reduce(
        jnp.maximum, (_shifted(mags, s, n_off) for s in PREAMBLE_LOWS)
    )
    dmin = functools.reduce(
        jnp.minimum, (_shifted(mags, s, n_off) for s in DF17_HIGHS)
    )
    dmax = functools.reduce(
        jnp.maximum, (_shifted(mags, s, n_off) for s in DF17_LOWS)
    )
    return (hmin >= lmax) & (dmin >= dmax)


def compact_detections(
    det: jnp.ndarray, max_candidates: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compact a (n_off,) bool mask into ascending candidate offsets.

    Gather-based: slot k holds the index of the (k+1)-th True element,
    found by binary-searching the cumulative count — O(K log N) vectorized
    gathers, no scatter (TPU scatters serialize and would dominate the
    pipeline). Returns (offsets (K,) int32 with invalid slots = n_off,
    valid (K,) bool, n_detections () int32). Detections beyond capacity are
    dropped (the count still reflects them, so callers can flag overflow).
    """
    n_off = det.shape[-1]
    counts = jnp.cumsum(det.astype(jnp.int32))
    ranks = jnp.arange(1, max_candidates + 1, dtype=jnp.int32)
    offsets = jnp.searchsorted(counts, ranks, side="left").astype(jnp.int32)
    valid = offsets < n_off
    return offsets, valid, counts[-1]


def slice_bits(mags: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Bit-slice candidate windows: (L,) mags x (K,) offsets -> (K, 112) bits.

    bit_k = mag[o+16+2k] > mag[o+16+2k+1] (falling edge = 1), matching the
    reference's relative slicer + Manchester fold (demod.rs:92-131,180-201).
    Offsets must be in-range (clamp before calling).
    """

    def one(offset):
        window = jax.lax.dynamic_slice(mags, (offset + DATA_OFFSET,), (FRAME_SAMPLES,))
        return (window[0::2] > window[1::2]).astype(jnp.uint8)

    return jax.vmap(one)(offsets)


def scan_block(
    mags: jnp.ndarray,
    n_off: int,
    max_candidates: int,
) -> dict[str, jnp.ndarray]:
    """Detect + compact + slice one magnitude block (static n_off).

    Args:
      mags: (L,) uint32 with L >= n_off + WINDOW - 1 ... callers guarantee
        every window [o, o+240) for o < n_off is in bounds (L >= n_off+239).
    Returns dict with:
      offsets (K,) int32   — ascending detection offsets (invalid = n_off)
      valid   (K,) bool
      bits    (K, 112) uint8
      n_detections () int32
    """
    det = detect(mags, n_off)
    offsets, valid, n_det = compact_detections(det, max_candidates)
    safe = jnp.where(valid, offsets, 0)
    bits = slice_bits(mags, safe)
    return {
        "offsets": offsets,
        "valid": valid,
        "bits": bits,
        "n_detections": n_det,
    }
