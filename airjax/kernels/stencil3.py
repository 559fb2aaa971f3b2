"""Mosaic stencil, attempt 3: shift-sharing tree + biased-int16 packing.

Attempts 1-2 (airjax/kernels/magdet.py) lost to the XLA-fused stencil
because Mosaic pays one lane rotation + row select per shifted view: the
26-shift preamble/DF17 stencil (src/adsb/demod.rs:17-57 semantics) costs
25 rolls + 25 selects + 22 min/max per sample, ~3x the load-offset cost
XLA's fusion pays. This third attempt cuts the roll count structurally
and halves the per-op element cost:

1. **Shift-sharing tree.** min/max are idempotent, so for any shift sets
   B, C: reduce_{s in B+C} S_s(m) == reduce_{c in C} S_c(reduce_{b in B}
   S_b(m)) whenever B+C (Minkowski sum) equals the target set. The four
   stencil sets decompose as:
     highs  {0,2,7,9}                     = {0,2} + {0,7}
     lows   {1,3,4,5,6,8,10,..,15}        = ({0,2}+{3,10,12}+{0,1}) u ({1}+{0,7})
     df17hi {16,19,21,23,24}              = 16 + (({0,3}+{0,5}) u {7})
     df17lo {17,18,20,22,25}              = 17 + (({0,3}+{0,5}) u {1})
   with the roll-2/roll-7/roll-3 views shared between the min- and
   max-trees. Total: 16 rolls (incl. the S1 for the PPM pair-compare)
   and 14 min/max, vs 25 and 22 flat.

2. **Biased int16.** Magnitudes fit u16 (<= 46341); v = mag - 32768 is
   an order-preserving int16, so every roll/min/max/compare in the tree
   runs on (16,128)-tiled int16 vregs — half the vector slots of the
   int32 formulation. The magnitude itself stays int32/f32 (the exact
   isqrt needs the 32-bit squares) with a single narrowing convert.

Each _sh() consumes one row (128 samples) of validity; the deepest chain
is 3 shifts, far inside the EXTRA_ROWS=8 lookahead margin.

VERDICT (measured within-run on the v5e, tools/bench_stencil3.py,
2026-08-20; full numbers in PERF_r03.md): **retired — XLA keeps the
production path.**

  * tree32: 1.751 ms/pass vs attempt-1's 2.013 (the 25->16 roll cut is
    real, 1.15x kernel-side) but still 0.76x of the XLA-fused stage's
    1.337 ms.
  * Per-roll accounting: (2.013 - 1.751) / 9 rolls ~= 29 us/roll at
    16.7M samples; extrapolating to ZERO rolls puts the kernel floor at
    ~1.29 ms — a tie with XLA's 1.337 ms. The kernel's entire deficit
    is rotation cost; there is no headroom left even for a hypothetical
    roll-free formulation.
  * tree16/flat16: blocked by TWO independent Mosaic legalization gaps
    on this toolchain — tpu.dynamic_rotate is "not implemented: Rotate
    with non-32-bit data", and with the rotation re-expressed as a
    same-row lane-slice concat the int16 min itself fails
    ("failed to legalize operation 'arith.minsi'" on
    vector<8x128x2xi16>). Packed-i16 min/max is unavailable at the
    infrastructure level, not just unprofitable.

This closes the "~1.8x VPU headroom" question PERF_r02 left open: the
55%-of-VPU-speed-of-light the XLA stencil achieves already prices in
the 26 shifted loads; a Mosaic kernel must rematerialize those shifts
as rolls, which cost MORE than what fusion saves. Kept as a correct,
tested record of the attempt (tests/test_stencil3.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from airjax.kernels.magdet import (
    EXTRA,
    EXTRA_ROWS,
    LANES,
    TILE,
    TILE_ROWS,
    _mag_from_words,
)


def _sh(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Flat shift by s in [0, 128): (R, 128) -> (R-1, 128), out[i] = x[i+s].

    One lane rotation + a lane-indexed select between the current and next
    row (Mosaic rejects concatenating lane slices at different row
    offsets). Exact at every flat position of the (R-1)-row result.

    Mosaic's tpu.dynamic_rotate is 32-bit only ("not implemented: Rotate
    with non-32-bit data", measured 2026-08), so sub-32-bit dtypes express
    the rotation as a same-row lane-slice concat instead.
    """
    rows = x.shape[0] - 1
    if s == 0:
        return x[:rows, :]
    if x.dtype.itemsize == 4:
        rolled = pltpu.roll(x, LANES - s, 1)
    else:
        rolled = jnp.concatenate([x[:, s:], x[:, :s]], axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return jnp.where(lane < LANES - s, rolled[:rows, :], rolled[1 : rows + 1, :])


def _crop(*xs: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Truncate every array to the shallowest row count among them."""
    rows = min(x.shape[0] for x in xs)
    return tuple(x[:rows, :] for x in xs)


def _tree_det_cmp(m: jnp.ndarray, out_rows: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shift-sharing stencil over an extended magnitude block.

    Args:
      m: (R, 128) magnitudes (int32 or biased int16), R >= out_rows + 4.
    Returns:
      det (out_rows, 128) bool, cmp (out_rows, 128) bool.
    """
    mn, mx = jnp.minimum, jnp.maximum

    r1 = _sh(m, 1)  # S1(m): the PPM pair-compare view
    r2 = _sh(m, 2)
    r3 = _sh(m, 3)
    r7 = _sh(m, 7)
    m_, r2_, r3_, r7_ = _crop(m, r2, r3, r7)

    # Preamble highs {0,2,7,9} = {0,2} + {0,7}
    a2min = mn(m_, r2_)
    hmin = mn(*_crop(a2min, _sh(a2min, 7)))

    # Preamble lows: ({0,2} + {3,10,12} + {0,1}) u ({1} + {0,7})
    a2max = mx(m_, r2_)
    bmax = mx(_sh(a2max, 3), mx(_sh(a2max, 10), _sh(a2max, 12)))
    c = mx(*_crop(bmax, _sh(bmax, 1)))
    e = mx(m_, r7_)  # {0,7}
    lmax = mx(*_crop(c, _sh(e, 1)))

    # DF17 highs 16 + (({0,3} + {0,5}) u {7}); lows 17 + (same u {1}),
    # sharing the roll-3 view between the min- and max-trees.
    gmin = mn(m_, r3_)
    gmax = mx(m_, r3_)
    g2min = mn(*_crop(gmin, _sh(gmin, 5)))  # {0,3,5,8}
    g2max = mx(*_crop(gmax, _sh(gmax, 5)))
    dmin = mn(*_crop(_sh(g2min, 16), _sh(m, 23)))
    dmax = mx(*_crop(_sh(g2max, 17), _sh(m, 18)))

    hmin, lmax, dmin, dmax, m_, r1 = (
        x[:out_rows, :] for x in (hmin, lmax, dmin, dmax, m, r1)
    )
    det = (hmin >= lmax) & (dmin >= dmax)
    return det, m_ > r1


def _tree_kernel_i32(iq_ref, head_ref, det_ref, cmp_ref):
    m = jnp.concatenate(
        [_mag_from_words(iq_ref[:, :]), _mag_from_words(head_ref[:, :])], axis=0
    )
    det, cmp = _tree_det_cmp(m, TILE_ROWS)
    det_ref[:, :] = det.astype(jnp.uint8)
    cmp_ref[:, :] = cmp.astype(jnp.uint8)


def _tree_kernel_i16(iq_ref, head_ref, det_ref, cmp_ref):
    m32 = jnp.concatenate(
        [_mag_from_words(iq_ref[:, :]), _mag_from_words(head_ref[:, :])], axis=0
    )
    # mag in [0, 46341] -> order-preserving int16 (one narrowing convert;
    # every stencil op below runs sublane-packed 2-per-slot).
    m = (m32 - 32768).astype(jnp.int16)
    det, cmp = _tree_det_cmp(m, TILE_ROWS)
    det_ref[:, :] = det.astype(jnp.uint8)
    cmp_ref[:, :] = cmp.astype(jnp.uint8)


def _flat_kernel_i16(iq_ref, head_ref, det_ref, cmp_ref):
    """int16 WITHOUT the sharing tree (flat 25-roll formulation) — isolates
    the packing win from the tree win in the A/B."""
    from airjax.dsp.demod import (
        DF17_HIGHS,
        DF17_LOWS,
        PREAMBLE_HIGHS,
        PREAMBLE_LOWS,
    )

    m32 = jnp.concatenate(
        [_mag_from_words(iq_ref[:, :]), _mag_from_words(head_ref[:, :])], axis=0
    )
    m = (m32 - 32768).astype(jnp.int16)
    shifts = sorted(
        set(PREAMBLE_HIGHS) | set(PREAMBLE_LOWS) | set(DF17_HIGHS) | set(DF17_LOWS)
    )
    sh = {s: _sh(m, s)[:TILE_ROWS, :] if s else m[:TILE_ROWS, :] for s in shifts}
    hmin = functools.reduce(jnp.minimum, (sh[s] for s in PREAMBLE_HIGHS))
    lmax = functools.reduce(jnp.maximum, (sh[s] for s in PREAMBLE_LOWS))
    dmin = functools.reduce(jnp.minimum, (sh[s] for s in DF17_HIGHS))
    dmax = functools.reduce(jnp.maximum, (sh[s] for s in DF17_LOWS))
    det_ref[:, :] = ((hmin >= lmax) & (dmin >= dmax)).astype(jnp.uint8)
    cmp_ref[:, :] = (sh[0] > sh[1]).astype(jnp.uint8)


_KERNELS = {
    "tree32": _tree_kernel_i32,
    "tree16": _tree_kernel_i16,
    "flat16": _flat_kernel_i16,
}


@functools.partial(jax.jit, static_argnames=("variant", "interpret"))
def magdet_tree(iq: jnp.ndarray, variant: str = "tree16", interpret: bool = False):
    """Attempt-3 fused magnitude + detection + pair-compare pass.

    Args:
      iq: (M, 2) int16 IQ with M = n + EXTRA, n a multiple of TILE
        (see airjax.kernels.magdet.pad_for_kernel).
      variant: 'tree32' | 'tree16' | 'flat16'.
    Returns:
      (det (n,) uint8, cmp (n,) uint8) — identical contract to
      airjax.kernels.magdet.magdet_fused.
    """
    m_total = iq.shape[0]
    n = m_total - EXTRA
    if n % TILE != 0:
        raise ValueError(f"IQ length {n}+{EXTRA} must be a multiple of {TILE}")
    grid = n // TILE

    words = jax.lax.bitcast_convert_type(iq, jnp.int32)
    words2d = words.reshape(m_total // LANES, LANES)

    det, cmp = pl.pallas_call(
        _KERNELS[variant],
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
