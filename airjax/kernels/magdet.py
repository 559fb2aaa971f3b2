"""Fused Pallas kernel: magnitude + preamble/DF17 detection + pair-compare.

The three leading stages of the decode pipeline are all elementwise/stencil
ops over the magnitude stream; run separately under XLA they cost ~2.3 ms
per 16M samples because the magnitudes round-trip through HBM between
stages. This kernel computes, in a single VMEM-resident pass per tile:

  mag[i]  = isqrt(re^2 + im^2)           (exact u32, matches src/utils.rs:48)
  det[i]  = preamble & DF17 gate          (26-sample stencil, demod.rs:17-57)
  cmp[i]  = mag[i] > mag[i+1]             (the PPM half-bit compare)

reading the int16 IQ exactly once (bitcast to one int32 word per sample)
and writing two uint8 streams — mags never touch HBM at all. Downstream
(compaction, word packing, CRC) stays in XLA where it is already fast.

Measured on a v5e chip at 16M samples: this kernel runs at ~8 GS/s vs
~12 GS/s for the XLA-fused equivalent — XLA's stencil fusion handles the
26 shifted views with plain offset loads, while Mosaic needs an explicit
lane rotation + row select per shift (lane-slice concats across different
row offsets don't lower). The XLA path therefore stays the default
(airjax.pipeline); this kernel is kept as a correct, tested alternative
and the starting point for a fully-fused variant (in-kernel word packing +
per-tile counts) that would also subsume the compaction input pass.

Layout: 1-D streams live as (rows, 128) tiles; the <=25-sample stencil
lookahead is fed by a second BlockSpec that maps the head of the *next*
tile, and flat shifts are two-slice lane/sublane concatenations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from airjax.dsp.demod import (
    DF17_HIGHS,
    DF17_LOWS,
    PREAMBLE_HIGHS,
    PREAMBLE_LOWS,
)

LANES = 128
TILE_ROWS = 512            # rows per grid step
TILE = TILE_ROWS * LANES   # 65536 samples per grid step
EXTRA_ROWS = 8             # 1024-sample lookahead (stencil needs only 26,
                           # but TPU block sublane dims must divide by 8)
EXTRA = EXTRA_ROWS * LANES


_SIGN = -(2**31)  # 0x80000000: unsigned-compare bias (python int so it
                  # folds into the kernel as an immediate, not a captured
                  # traced constant)


def _mag_from_words(w: jnp.ndarray) -> jnp.ndarray:
    """int32 word (I in low 16 bits, Q in high 16) -> exact magnitude.

    Mosaic has no uint32<->float casts, so everything runs in int32 with
    mod-2^32 wrapping and *biased* comparisons (a <=u b iff a^0x80000000
    <=s b^0x80000000); the f32 sqrt is only an estimate, made exact by a
    one-step integer fixup. Result fits int32 (<= 46341).
    """
    re = jnp.right_shift(jnp.left_shift(w, 16), 16)  # sign-extended low half
    im = jnp.right_shift(w, 16)  # arithmetic shift: sign-extended high half
    s = re * re + im * im  # exact mod 2^32 (wraps only at exactly 2^31)
    sb = s ^ _SIGN
    re_f = re.astype(jnp.float32)
    im_f = im.astype(jnp.float32)
    s_f = re_f * re_f + im_f * im_f  # approximate (|err| < ~200)
    k = jnp.sqrt(s_f).astype(jnp.int32)
    up = k + 1
    k = jnp.where(((up * up) ^ _SIGN) <= sb, up, k)
    k = jnp.where((k > 0) & (((k * k) ^ _SIGN) > sb), k - 1, k)
    return k


def _shift(m: jnp.ndarray, s: int, rows: int) -> jnp.ndarray:
    """Flat shift by s (< 128) of a (rows+extra, 128) stream -> (rows, 128).

    Implemented as one lane rotation + a lane-indexed select between the
    current and next row (Mosaic rejects concatenating lane slices taken at
    different row offsets, so no concat here).
    """
    if s == 0:
        return m[:rows, :]
    # pltpu.roll requires non-negative shifts; rotating right by 128-s is a
    # left rotation by s: rolled[r, c] = m[r, (c+s) % 128].
    rolled = pltpu.roll(m, LANES - s, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return jnp.where(lane < LANES - s, rolled[:rows, :], rolled[1 : rows + 1, :])


def _magdet_kernel(iq_ref, head_ref, det_ref, cmp_ref):
    mag_tile = _mag_from_words(iq_ref[:, :])  # (TILE_ROWS, 128)
    mag_head = _mag_from_words(head_ref[:, :])  # (EXTRA_ROWS, 128)
    m = jnp.concatenate([mag_tile, mag_head], axis=0)

    shifted = {
        s: _shift(m, s, TILE_ROWS)
        for s in sorted(
            set(PREAMBLE_HIGHS) | set(PREAMBLE_LOWS) | set(DF17_HIGHS) | set(DF17_LOWS)
        )
    }
    hmin = functools.reduce(jnp.minimum, (shifted[s] for s in PREAMBLE_HIGHS))
    lmax = functools.reduce(jnp.maximum, (shifted[s] for s in PREAMBLE_LOWS))
    dmin = functools.reduce(jnp.minimum, (shifted[s] for s in DF17_HIGHS))
    dmax = functools.reduce(jnp.maximum, (shifted[s] for s in DF17_LOWS))
    det = (hmin >= lmax) & (dmin >= dmax)

    det_ref[:, :] = det.astype(jnp.uint8)
    cmp_ref[:, :] = (shifted[0] > shifted[1]).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def magdet_fused(iq: jnp.ndarray, interpret: bool = False):
    """Run the fused kernel over an IQ stream.

    Args:
      iq: (M, 2) int16 with M a multiple of TILE plus EXTRA lookahead
        samples (callers pad; see pad_for_kernel).
    Returns:
      (det (M-EXTRA,) uint8, cmp (M-EXTRA,) uint8) — det[i] is the
      detection gate at offset i, cmp[i] = mag[i] > mag[i+1].
    """
    m_total = iq.shape[0]
    n = m_total - EXTRA
    if n % TILE != 0:
        raise ValueError(f"IQ length {n}+{EXTRA} must be a multiple of {TILE}")
    grid = n // TILE

    words = jax.lax.bitcast_convert_type(iq, jnp.int32)  # (M,)
    words2d = words.reshape(m_total // LANES, LANES)

    det, cmp = pl.pallas_call(
        _magdet_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (EXTRA_ROWS, LANES),
                lambda i: ((i + 1) * (TILE_ROWS // EXTRA_ROWS), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint8),
        ],
        interpret=interpret,
    )(words2d, words2d)
    return det.reshape(n), cmp.reshape(n)


def pad_for_kernel(iq: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """Pad (M, 2) int16 IQ to kernel geometry; returns (padded, n_domain)."""
    m = iq.shape[0]
    n_domain = -(-m // TILE) * TILE
    pad = n_domain + EXTRA - m
    padded = jnp.pad(iq, ((0, pad), (0, 0)))
    return padded, n_domain


# ---------------------------------------------------------------------------
# Phase B: fully-fused variant — magnitude + detection + pair-compare +
# IN-KERNEL bit packing, so the separate pack_cmp_words pass (a full
# (N/32, 32) x weights reduction over HBM, ~1.5 ms / 16M samples — the
# single largest non-detect cost in the XLA pipeline) disappears.
#
# Packing layout: 8 cmp bits per byte via a 3-step lane roll-add tree.
# After weighting bit l by 1 << (7 - (l & 7)), b3[l] = sum_{d=0}^{7}
# w[l+d] equals the MSB-first byte of bits [l, l+8) — exact at every lane
# l that is a multiple of 8. Extracting those 16 valid lanes per row
# would be a strided lane gather (a pathological relayout on TPU), so the
# kernel stores the FULL (rows, 128) byte plane and the downstream
# gather uses the sparse index map instead:
#
#   flat cmp bit p  ->  byte index B = p >> 3
#                   ->  stored at flat position (B >> 4) * 128 + (B & 15) * 8
#
# The 8x storage overhead costs one extra u8 HBM write per sample — far
# cheaper than the packing pass it replaces, and the candidate gather
# side touches only ~112 bytes per candidate.
# ---------------------------------------------------------------------------


def _magdet_packed_kernel(iq_ref, head_ref, det_ref, pb_ref):
    mag_tile = _mag_from_words(iq_ref[:, :])
    mag_head = _mag_from_words(head_ref[:, :])
    m = jnp.concatenate([mag_tile, mag_head], axis=0)

    shifted = {
        s: _shift(m, s, TILE_ROWS)
        for s in sorted(
            set(PREAMBLE_HIGHS) | set(PREAMBLE_LOWS) | set(DF17_HIGHS) | set(DF17_LOWS)
        )
    }
    hmin = functools.reduce(jnp.minimum, (shifted[s] for s in PREAMBLE_HIGHS))
    lmax = functools.reduce(jnp.maximum, (shifted[s] for s in PREAMBLE_LOWS))
    dmin = functools.reduce(jnp.minimum, (shifted[s] for s in DF17_HIGHS))
    dmax = functools.reduce(jnp.maximum, (shifted[s] for s in DF17_LOWS))
    det_ref[:, :] = ((hmin >= lmax) & (dmin >= dmax)).astype(jnp.uint8)

    cmp = (shifted[0] > shifted[1]).astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, cmp.shape, 1)
    weighted = cmp << (7 - (lane & 7))
    # Lane-left rolls: rolled[r, c] = x[r, (c + s) % 128]. The 8-wide
    # window never wraps at the valid lanes (multiples of 8), so the
    # wrap-around garbage lands only in lanes the index map never reads.
    b = weighted + pltpu.roll(weighted, LANES - 1, 1)
    b = b + pltpu.roll(b, LANES - 2, 1)
    b = b + pltpu.roll(b, LANES - 4, 1)
    pb_ref[:, :] = b.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def magdet_packed(iq: jnp.ndarray, interpret: bool = False):
    """Fully-fused pass: (M, 2) int16 IQ -> (det, packed_bytes).

    Args:
      iq: (M, 2) int16 with M = n + EXTRA, n a multiple of TILE
        (see pad_for_kernel).
    Returns:
      det (n,) uint8 — detection gate per offset;
      packed (n,) uint8 — sparse byte plane (see module comment); read it
        with airjax.dsp.demod.slice_bits_sparse_bytes.
    """
    m_total = iq.shape[0]
    n = m_total - EXTRA
    if n % TILE != 0:
        raise ValueError(f"IQ length {n}+{EXTRA} must be a multiple of {TILE}")
    grid = n // TILE

    words = jax.lax.bitcast_convert_type(iq, jnp.int32)
    words2d = words.reshape(m_total // LANES, LANES)

    det, packed = pl.pallas_call(
        _magdet_packed_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (EXTRA_ROWS, LANES),
                lambda i: ((i + 1) * (TILE_ROWS // EXTRA_ROWS), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint8),
        ],
        interpret=interpret,
    )(words2d, words2d)
    return det.reshape(n), packed.reshape(n)
