"""Round-2 perf campaign: per-stage roofline table + within-run variant A/B.

Stage prefixes (cumulative, two-point slope like bench.py) give the
bytes-moved roofline table VERDICT r1 asked for; the full-pipeline variants
then attack the top consumer. All timings happen in ONE process on one
device session so comparisons are within-run (cross-run tunnel variance is
up to 3x — CLAUDE.md).

Variants (W = promoted win, L = measured loss; see PERF_r02.md):
  base      — r1 production pipeline (u32 mags + lane-minor VPU pack)
  u16       W u16 magnitudes (lossless; halves magnitude-stream bytes)
  mxp/u16mxp W MXU matmul bit-pack (same word layout, full lane width)
  ilv/u16ilv L interleaved sublane pack (its per-bit word gathers kill it)
  dense/u16dense L cmp as u8 plane, (K,112) byte-gather slice
  lazy/u16lazy/u16lazymxp L preamble-only stencil + per-candidate DF17
  u16bc     L bit-packed compaction (16-word tiles + popcount rank-select)
  u16ds     — vmapped-dynamic-slice word fetch (HANGS the remote compiler)
  u16bar    — optimization_barrier after mags (HANGS the remote compiler)
  u16crcf32 = f32-MXU CRC (wash; CRC is already free)
  tile128/256/1024 — compaction tile sweep (wash/wash/L)
  ext       — extended-mode pipeline (all DFs, 16k capacity)
  flatS/trS/sliceU16/compactU16/sliceDS/shapeOld/shapeNew — stage probes
  trS       L transposed row-stencil (the 128xseg transpose dominates)
  shapeOld/shapeNew — overlap-decomposition slice shapes (new promoted)

Run: python tools/bench_r2.py [--r-big 42] [--repeat 3] [--stages]
     [--variants base,u16mxp,...] [--platform cpu]
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from airjax.dsp.demod import (
    DATA_OFFSET,
    FRAME_BITS,
    WINDOW,
    detect,
    pack_cmp_words,
    slice_bits_packed,
)
from airjax.dsp.magnitude import magnitude_u32
from airjax.pipeline import compact_mask, decode_mags_block
from airjax.protocol.crc import bits_to_bytes, crc_check_and_recover
from tools.bench_fused import BLOCK, CAPACITY, build_iq, make_step, timed

HBM_GBPS = 819.0  # v5e HBM bandwidth (public spec: 819 GB/s)


# --------------------------------------------------------------------------
# Variant: interleaved sublane pack
# --------------------------------------------------------------------------

PACK_BLOCK = 32 * 128  # one (32, 128) tile packs 4096 cmp bits


def pack_cmp_words_ilv(mags: jnp.ndarray) -> jnp.ndarray:
    """cmp bit p lands in flat word (p >> 12) * 128 + (p & 127), bit
    position (p >> 7) & 31 (MSB first). The (R, 32, 128) reshape is
    contiguous and the 32-deep reduction runs along sublanes at full lane
    width."""
    cmp = (mags[:-1] > mags[1:]).astype(jnp.uint32)
    n = cmp.shape[0]
    n_blk = -(-n // PACK_BLOCK)
    padded = jnp.pad(cmp, (0, n_blk * PACK_BLOCK - n)).reshape(n_blk, 32, 128)
    weights = (jnp.uint32(1) << jnp.arange(31, -1, -1, dtype=jnp.uint32))[
        None, :, None
    ]
    words = jnp.sum(padded * weights, axis=1, dtype=jnp.uint32)  # (n_blk, 128)
    return words.reshape(-1)


def slice_bits_ilv(words: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    d0 = (offsets + DATA_OFFSET).astype(jnp.int32)
    t = jnp.arange(FRAME_BITS, dtype=jnp.int32)
    p = d0[:, None] + 2 * t[None, :]  # (K, 112)
    widx = ((p >> 12) << 7) + (p & 127)
    shift = (31 - ((p >> 7) & 31)).astype(jnp.uint32)
    return ((words[widx] >> shift) & 1).astype(jnp.uint8)


# --------------------------------------------------------------------------
# Variant: dense u8 cmp plane (no pack)
# --------------------------------------------------------------------------


def slice_bits_dense(cmp8: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    d0 = (offsets + DATA_OFFSET).astype(jnp.int32)
    t = jnp.arange(FRAME_BITS, dtype=jnp.int32)
    return cmp8[d0[:, None] + 2 * t[None, :]]


# --------------------------------------------------------------------------
# Pipeline bodies
# --------------------------------------------------------------------------


def body_base(iq, n_off, capacity):
    mags = magnitude_u32(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    valid = offsets < n_off
    words = pack_cmp_words(mags)
    bits = slice_bits_packed(words, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = crc_check_and_recover(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


def body_ilv(iq, n_off, capacity):
    mags = magnitude_u32(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    valid = offsets < n_off
    words = pack_cmp_words_ilv(mags)
    bits = slice_bits_ilv(words, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = crc_check_and_recover(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


def body_dense(iq, n_off, capacity):
    mags = magnitude_u32(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    valid = offsets < n_off
    cmp8 = (mags[:-1] > mags[1:]).astype(jnp.uint8)
    bits = slice_bits_dense(cmp8, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = crc_check_and_recover(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


def pack_cmp_words_mxu(mags: jnp.ndarray) -> jnp.ndarray:
    """Bit-pack via one MXU matmul, emitting the SAME flat word layout as
    pack_cmp_words (so slice_bits_packed is unchanged).

    Row r of the (N/128, 128) cmp matrix packs into 4 words; a (128, 8)
    weight matrix produces each word's hi/lo 16-bit halves as exact f32
    sums (<= 65535 < 2^24), recombined with integer shifts. The reduction
    runs on the MXU at full lane width instead of the VPU's lane-minor
    (N/32, 32) reduce."""
    cmp = (mags[:-1] > mags[1:]).astype(jnp.float32)
    n = cmp.shape[0]
    n_rows = -(-n // 128)
    padded = jnp.pad(cmp, (0, n_rows * 128 - n)).reshape(n_rows, 128)
    w = np.zeros((128, 8), np.float32)
    for j in range(4):
        for i in range(32):
            if i < 16:
                w[32 * j + i, 2 * j] = float(1 << (15 - i))
            else:
                w[32 * j + i, 2 * j + 1] = float(1 << (31 - i))
    out = jnp.dot(padded, jnp.asarray(w), preferred_element_type=jnp.float32)
    hi = out[:, 0::2].astype(jnp.uint32)
    lo = out[:, 1::2].astype(jnp.uint32)
    words = ((hi << 16) | lo).reshape(-1)
    return jnp.pad(words, (0, 8))  # _WORDS_PER_CAND guard words


def body_mxp(iq, n_off, capacity):
    mags = magnitude_u32(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    valid = offsets < n_off
    words = pack_cmp_words_mxu(mags)
    bits = slice_bits_packed(words, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = crc_check_and_recover(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


def body_u16_mxp(iq, n_off, capacity):
    mags = magnitude_u16(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    valid = offsets < n_off
    words = pack_cmp_words_mxu(mags)
    bits = slice_bits_packed(words, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = crc_check_and_recover(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


def magnitude_u16(iq: jnp.ndarray) -> jnp.ndarray:
    """Exact magnitudes stored u16: max |IQ| = isqrt(2^31) = 46340 < 2^16,
    so narrowing is lossless and halves every magnitude-stream HBM pass
    (write + two reads). Comparisons on u16 are identical to u32."""
    return magnitude_u32(iq).astype(jnp.uint16)


def body_u16(iq, n_off, capacity):
    mags = magnitude_u16(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    valid = offsets < n_off
    words = pack_cmp_words(mags)
    bits = slice_bits_packed(words, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = crc_check_and_recover(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


def body_u16_dense(iq, n_off, capacity):
    mags = magnitude_u16(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    valid = offsets < n_off
    cmp8 = (mags[:-1] > mags[1:]).astype(jnp.uint8)
    bits = slice_bits_dense(cmp8, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = crc_check_and_recover(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


def body_u16_ilv(iq, n_off, capacity):
    mags = magnitude_u16(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    valid = offsets < n_off
    words = pack_cmp_words_ilv(mags)
    bits = slice_bits_ilv(words, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = crc_check_and_recover(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


# --------------------------------------------------------------------------
# Variant: lazy DF17 — preamble-only stencil, DF17 pattern checked only at
# the ~0.05% of offsets that pass the preamble (tiny gathers), then a
# second small compaction down to the candidate capacity. Saves the DF17
# half of the stencil's ALU work (10 loads + 8 min/max + cmp per offset).
# --------------------------------------------------------------------------

PRE_CAPACITY = 16384  # preamble-only hits on noise ~0.055% of offsets


def df17_check_gather(mags: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    from airjax.dsp.demod import DF17_HIGHS, DF17_LOWS

    h = jnp.asarray(DF17_HIGHS, dtype=jnp.int32)
    l = jnp.asarray(DF17_LOWS, dtype=jnp.int32)
    mh = mags[offsets[:, None] + h[None, :]]  # (K, 5)
    ml = mags[offsets[:, None] + l[None, :]]  # (K, 5)
    return jnp.min(mh, axis=1) >= jnp.max(ml, axis=1)


def _body_lazy(mags, n_off, capacity):
    from airjax.dsp.demod import detect_preamble_only

    pre = detect_preamble_only(mags, n_off)
    pre_off, n_pre = compact_mask(pre, PRE_CAPACITY)
    pre_valid = pre_off < n_off
    safe_pre = jnp.where(pre_valid, pre_off, 0)
    df17 = df17_check_gather(mags, safe_pre) & pre_valid
    n_det = jnp.sum(df17, dtype=jnp.int32)
    # Recompact the (PRE_CAPACITY,) df17 mask down to `capacity` slots.
    sel, _ = compact_mask(df17, capacity)
    sel_valid = sel < PRE_CAPACITY
    offsets = jnp.where(sel_valid, pre_off[jnp.where(sel_valid, sel, 0)], n_off)
    valid = offsets < n_off
    words = pack_cmp_words(mags)
    bits = slice_bits_packed(words, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = crc_check_and_recover(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


def body_lazy(iq, n_off, capacity):
    return _body_lazy(magnitude_u32(iq), n_off, capacity)


def body_u16_lazy(iq, n_off, capacity):
    return _body_lazy(magnitude_u16(iq), n_off, capacity)


def body_u16_lazy_mxp(iq, n_off, capacity):
    mags = magnitude_u16(iq)
    from airjax.dsp.demod import detect_preamble_only

    pre = detect_preamble_only(mags, n_off)
    pre_off, n_pre = compact_mask(pre, PRE_CAPACITY)
    pre_valid = pre_off < n_off
    safe_pre = jnp.where(pre_valid, pre_off, 0)
    df17 = df17_check_gather(mags, safe_pre) & pre_valid
    n_det = jnp.sum(df17, dtype=jnp.int32)
    sel, _ = compact_mask(df17, capacity)
    sel_valid = sel < PRE_CAPACITY
    offsets = jnp.where(sel_valid, pre_off[jnp.where(sel_valid, sel, 0)], n_off)
    valid = offsets < n_off
    words = pack_cmp_words_mxu(mags)
    bits = slice_bits_packed(words, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = crc_check_and_recover(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


# --------------------------------------------------------------------------
# Transposed-layout exploration: positions along sublanes so every stencil
# shift is a lane-aligned row slice. Pseudo-stage bodies measure the pieces.
# --------------------------------------------------------------------------


def _iq_words(iq):
    return jax.lax.bitcast_convert_type(iq, jnp.int32).reshape(-1)


def _mag_from_words_xla(w):
    re = jnp.right_shift(jnp.left_shift(w, 16), 16).astype(jnp.int32)
    im = jnp.right_shift(w, 16).astype(jnp.int32)
    s = (re * re).astype(jnp.uint32) + (im * im).astype(jnp.uint32)
    k = jnp.sqrt(s.astype(jnp.float32)).astype(jnp.uint32)
    up = k + 1
    k = jnp.where(up * up <= s, up, k)
    k = jnp.where((k > 0) & (k * k > s), k - 1, k)
    return k.astype(jnp.uint16)


def stage_flat_stencil(iq, n_off, capacity):
    """Flat-layout twin of stage_tr_stencil: mag u16 + stencil + cmp + pack
    (no compaction/CRC) so the transposed variant has a like-for-like rival."""
    mags = magnitude_u16(iq)
    det = detect(mags, n_off)
    words = pack_cmp_words(mags)
    s = jnp.sum(det, dtype=jnp.int32)
    return s + jnp.sum(words[:8].astype(jnp.int32)), s


def stage_tr_stencil(iq, n_off, capacity):
    """Transpose + mag + ROW-shift stencil + cmp (everything lane-aligned)."""
    w = _iq_words(iq)
    seg = w.shape[0] // 128
    y = w[: seg * 128].reshape(128, seg).T  # (seg, 128)
    y = jax.lax.optimization_barrier(y)
    mags = _mag_from_words_xla(y)  # (seg, 128) u16

    def rs(s, n):  # row-shifted view
        return jax.lax.dynamic_slice_in_dim(mags, s, n, axis=0)

    n = seg - 26
    hmin = functools.reduce(jnp.minimum, (rs(s, n) for s in (0, 2, 7, 9)))
    lmax = functools.reduce(
        jnp.maximum, (rs(s, n) for s in (1, 3, 4, 5, 6, 8, 10, 11, 12, 13, 14, 15))
    )
    dmin = functools.reduce(jnp.minimum, (rs(s, n) for s in (16, 19, 21, 23, 24)))
    dmax = functools.reduce(jnp.maximum, (rs(s, n) for s in (17, 18, 20, 22, 25)))
    det = (hmin >= lmax) & (dmin >= dmax)
    cmp = mags[:-1] > mags[1:]
    # Vertical pack of cmp: (R/32, 32, 128) contiguous row-split, sublane sum.
    r32 = (seg - 1) // 32
    c3 = cmp[: r32 * 32].reshape(r32, 32, 128).astype(jnp.uint32)
    wts = (jnp.uint32(1) << jnp.arange(31, -1, -1, dtype=jnp.uint32))[None, :, None]
    words = jnp.sum(c3 * wts, axis=1, dtype=jnp.uint32)
    return (
        jnp.sum(det, dtype=jnp.int32) + jnp.sum(words[:1].astype(jnp.int32)),
        jnp.sum(det, dtype=jnp.int32),
    )


def stage_slice_u16(iq, n_off, capacity):
    """Everything except CRC/recovery/frame pack: isolates the candidate
    slicing cost from the CRC tail."""
    mags = magnitude_u16(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    valid = offsets < n_off
    words = pack_cmp_words(mags)
    bits = slice_bits_packed(words, jnp.where(valid, offsets, 0))
    return jnp.sum(bits.astype(jnp.int32)), n_det


def _crc_check_and_recover_f32(bits112):
    """crc_check_and_recover with the GF(2) matmul in f32 on the MXU
    (sums <= 88 exact) instead of int32 on the VPU."""
    from airjax.protocol.crc import (
        CRC_BITS,
        DATA_BITS,
        crc_matrix,
        pack_bits_msbfirst,
        syndromes,
    )

    matrix = jnp.asarray(crc_matrix(), dtype=jnp.float32)
    sums = jnp.dot(
        bits112[..., :DATA_BITS].astype(jnp.float32),
        matrix,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    calced = pack_bits_msbfirst(sums & 1, CRC_BITS)
    packet_crc = pack_bits_msbfirst(bits112[..., DATA_BITS:], CRC_BITS)
    delta = calced ^ packet_crc
    ok = delta == 0
    table = jnp.asarray(syndromes(), dtype=jnp.uint32)
    match = delta[..., None] == table
    found = jnp.any(match, axis=-1) & ~ok
    flip = jnp.pad(match, [(0, 0)] * (match.ndim - 1) + [(0, CRC_BITS)])
    corrected = jnp.where(
        found[..., None], bits112 ^ flip.astype(bits112.dtype), bits112
    )
    return corrected, ok | found, found


def body_u16_crcf32(iq, n_off, capacity):
    mags = magnitude_u16(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    valid = offsets < n_off
    words = pack_cmp_words(mags)
    bits = slice_bits_packed(words, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = _crc_check_and_recover_f32(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


def stage_compact_u16(iq, n_off, capacity):
    mags = magnitude_u16(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    return jnp.sum(offsets, dtype=jnp.int32), n_det


def slice_bits_packed_ds(words, offsets):
    """slice_bits_packed with the (K, 8) word fetch as K contiguous
    8-word dynamic slices (one gather with slice_sizes=8) instead of K*8
    independent element lookups."""
    from airjax.dsp.demod import _WORDS_PER_CAND

    d0 = offsets + DATA_OFFSET
    word0 = d0 >> 5
    align = (d0 & 31).astype(jnp.uint32)
    gathered = jax.vmap(
        lambda i: jax.lax.dynamic_slice(words, (i,), (_WORDS_PER_CAND,))
    )(word0)
    t = jnp.arange(FRAME_BITS, dtype=jnp.uint32)
    pos = align[:, None] + 2 * t[None, :]
    word_sel = (pos >> 5).astype(jnp.int32)
    shift = 31 - (pos & 31)
    sel = jnp.zeros(pos.shape, dtype=jnp.uint32)
    for jj in range(_WORDS_PER_CAND):
        sel = jnp.where(word_sel == jj, gathered[:, jj : jj + 1], sel)
    return ((sel >> shift) & 1).astype(jnp.uint8)


def stage_slice_ds(iq, n_off, capacity):
    mags = magnitude_u16(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    valid = offsets < n_off
    words = pack_cmp_words(mags)
    bits = slice_bits_packed_ds(words, jnp.where(valid, offsets, 0))
    return jnp.sum(bits.astype(jnp.int32)), n_det


def body_u16_ds(iq, n_off, capacity):
    mags = magnitude_u16(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    valid = offsets < n_off
    words = pack_cmp_words(mags)
    bits = slice_bits_packed_ds(words, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = crc_check_and_recover(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


def _compact_tile(det, capacity, tile):
    from airjax.dsp.demod import compact_detections

    offsets, _, n_det = compact_detections(det, capacity, tile=tile)
    return offsets, n_det


def make_body_tile(tile):
    def body(iq, n_off, capacity):
        mags = magnitude_u16(iq)
        det = detect(mags, n_off)
        offsets, n_det = _compact_tile(det, capacity, tile)
        valid = offsets < n_off
        words = pack_cmp_words(mags)
        bits = slice_bits_packed(words, jnp.where(valid, offsets, 0))
        bits, crc_ok, recovered = crc_check_and_recover(bits)
        good = crc_ok & valid
        return jnp.sum(good, dtype=jnp.int32), n_det

    return body


def body_u16_barrier(iq, n_off, capacity):
    """u16mxp + optimization_barrier after the magnitude pass: tests
    whether XLA re-fuses the isqrt into the 26-shift stencil consumers
    (recompute per shift) instead of materializing mags once."""
    mags = jax.lax.optimization_barrier(magnitude_u16(iq))
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    valid = offsets < n_off
    words = pack_cmp_words(mags)
    bits = slice_bits_packed(words, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = crc_check_and_recover(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


def body_ext(iq, n_off, capacity):
    """Extended-mode pipeline (preamble-only detection => ~0.055% of
    offsets are candidates on noise, so capacity is raised to 16384)."""
    from airjax.pipeline import decode_mags_block_extended

    out = decode_mags_block_extended(magnitude_u16(iq), n_off, 16384)
    return (
        jnp.sum(out["good_long"], dtype=jnp.int32),
        out["n_detections"],
    )


# --------------------------------------------------------------------------
# Variant: bit-packed compaction — candidate tiles fetched as 16 u32 words
# (64 B) instead of 512 u8 (512 B); in-tile rank located via popcount
# prefix + a 5-step select-bit instead of a (K, 512) cumsum/compare.
# --------------------------------------------------------------------------


def _pack_mask_words(mask_u32):
    """(n,) {0,1} uint32 -> packed words, same layout as pack_cmp_words."""
    n = mask_u32.shape[0]
    n_rows = -(-n // 128)
    padded = jnp.pad(mask_u32.astype(jnp.float32), (0, n_rows * 128 - n)).reshape(
        n_rows, 128
    )
    from airjax.dsp.demod import _PACK_WEIGHTS

    out = jnp.dot(
        padded, jnp.asarray(_PACK_WEIGHTS), preferred_element_type=jnp.float32
    )
    hi = out[:, 0::2].astype(jnp.uint32)
    lo = out[:, 1::2].astype(jnp.uint32)
    return ((hi << 16) | lo).reshape(-1)


def compact_detections_packed(det, capacity, tile=512):
    """compact_detections with the candidate-tile fetch bit-packed."""
    n_off = det.shape[-1]
    n_tiles = -(-n_off // tile)
    wpt = tile // 32  # words per tile
    d = jnp.pad(det, (0, n_tiles * tile - n_off))
    row_counts = jnp.sum(d.reshape(n_tiles, tile), axis=1, dtype=jnp.int32)
    row_cum = jnp.cumsum(row_counts)
    row_start = row_cum - row_counts
    ranks = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    row_idx = jnp.searchsorted(row_cum, ranks, side="left").astype(jnp.int32)
    safe_row = jnp.minimum(row_idx, n_tiles - 1)

    words_all = _pack_mask_words(d.astype(jnp.uint32))  # (n_tiles*wpt,)
    words = words_all[: n_tiles * wpt].reshape(n_tiles, wpt)[safe_row]  # (K, wpt)
    pops = jax.lax.population_count(words).astype(jnp.int32)
    pop_cum = jnp.cumsum(pops, axis=1)
    local_rank = ranks - row_start[safe_row]  # 1-based within tile
    word_idx = jnp.sum(pop_cum < local_rank[:, None], axis=1, dtype=jnp.int32)
    sw = jnp.minimum(word_idx, wpt - 1)
    word = jnp.take_along_axis(words, sw[:, None], axis=1)[:, 0]
    rank_in_word = local_rank - jnp.where(
        sw > 0, jnp.take_along_axis(pop_cum, (sw - 1)[:, None], axis=1)[:, 0], 0
    )
    # Select the rank_in_word-th set bit from the MSB (ascending offset):
    # binary search by popcount of the window's top half; when the target
    # is in the lower half, shift it up and account for the skipped bits.
    pos = jnp.zeros_like(rank_in_word)
    rem = rank_in_word
    w = word
    for width in (16, 8, 4, 2, 1):
        hi = w >> jnp.uint32(32 - width)
        c = jax.lax.population_count(hi).astype(jnp.int32)
        go_lo = c < rem
        rem = jnp.where(go_lo, rem - c, rem)
        pos = jnp.where(go_lo, pos + width, pos)
        w = jnp.where(go_lo, w << jnp.uint32(width), w)
    offsets = safe_row * tile + sw * 32 + pos
    total = row_cum[-1]
    valid = ranks <= total
    return jnp.where(valid, offsets, n_off), total


def body_u16_bc(iq, n_off, capacity):
    mags = magnitude_u16(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_detections_packed(det, capacity)
    valid = offsets < n_off
    words = pack_cmp_words(mags)
    bits = slice_bits_packed(words, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = crc_check_and_recover(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


# Production overlap-decomposition shapes at block 2^22 (the fused parity
# scan's block): current = slice 2^22+239 / n_off 2^22; tuned = slice 2^22
# (aligned) / n_off 2^22-1264.
SUB = 1 << 22


def body_shape_old(iq, n_off, capacity):
    ext = jax.lax.dynamic_slice(iq, (0, 0), (SUB + 239, 2))
    out = decode_mags_block(magnitude_u16(ext), SUB, capacity)
    return out["n_good"], out["n_detections"]


def body_shape_new(iq, n_off, capacity):
    ext = jax.lax.dynamic_slice(iq, (0, 0), (SUB, 2))
    out = decode_mags_block(magnitude_u16(ext), SUB - 1264, capacity)
    return out["n_good"], out["n_detections"]


def body_u16_off1264(iq, n_off, capacity):
    """u16mxp with n_off = BLOCK - 1264 (the production overlap choice)
    instead of BLOCK - 240."""
    mags = magnitude_u16(iq)
    n2 = (BLOCK - 1264)
    det = detect(mags, n2)
    offsets, n_det = compact_mask(det, capacity)
    valid = offsets < n2
    words = pack_cmp_words(mags)
    bits = slice_bits_packed(words, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = crc_check_and_recover(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


VARIANTS = {
    "base": body_base,
    "ilv": body_ilv,
    "dense": body_dense,
    "u16": body_u16,
    "u16dense": body_u16_dense,
    "u16ilv": body_u16_ilv,
    "mxp": body_mxp,
    "u16mxp": body_u16_mxp,
    "lazy": body_lazy,
    "u16lazy": body_u16_lazy,
    "u16lazymxp": body_u16_lazy_mxp,
    "flatS": stage_flat_stencil,
    "sliceU16": stage_slice_u16,
    "compactU16": stage_compact_u16,
    "sliceDS": stage_slice_ds,
    "u16ds": body_u16_ds,
    "tile128": make_body_tile(128),
    "tile256": make_body_tile(256),
    "tile1024": make_body_tile(1024),
    "u16bar": body_u16_barrier,
    "ext": body_ext,
    "u16bc": body_u16_bc,
    "off1264": body_u16_off1264,
    "shapeOld": body_shape_old,
    "shapeNew": body_shape_new,
    "u16crcf32": body_u16_crcf32,
    "trS": stage_tr_stencil,
}


# --------------------------------------------------------------------------
# Stage prefixes for the roofline table
# --------------------------------------------------------------------------


def stage_mag(iq, n_off, capacity):
    s = jnp.sum(magnitude_u32(iq), dtype=jnp.uint32).astype(jnp.int32)
    return s, s


def stage_detect(iq, n_off, capacity):
    det = detect(magnitude_u32(iq), n_off)
    s = jnp.sum(det, dtype=jnp.int32)
    return s, s


def stage_compact(iq, n_off, capacity):
    det = detect(magnitude_u32(iq), n_off)
    offsets, n_det = compact_mask(det, capacity)
    return jnp.sum(offsets, dtype=jnp.int32), n_det


def stage_pack(iq, n_off, capacity):
    mags = magnitude_u32(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    words = pack_cmp_words(mags)
    return (
        jnp.sum(words[:8].astype(jnp.int32)) + jnp.sum(offsets, dtype=jnp.int32),
        n_det,
    )


# Rough minimum stream traffic per pass at BLOCK samples (bytes), assuming
# mags materialize once (they have two stream consumers) and the compaction
# reads the det mask once. Sparse candidate gathers (K * ~1 KB) are noise.
def stage_bytes(n: int) -> dict[str, float]:
    iq_r, mag_w = 4 * n, 4 * n
    mag_r, det_w = 4 * n, 1 * n
    det_r = 1 * n
    pack_r, pack_w = 4 * n, n / 8
    return {
        "mag": iq_r + mag_w,
        "detect": iq_r + mag_w + mag_r + det_w,
        "compact": iq_r + mag_w + mag_r + det_w + det_r,
        "pack": iq_r + mag_w + 2 * mag_r + det_w + det_r + pack_w,
        "full": iq_r + mag_w + 2 * mag_r + det_w + det_r + pack_w,
    }


def make_timer(name, body, iq, n_off, r_small, r_big):
    """Compile once; return a closure measuring one slope point."""
    step = make_step(body, n_off, CAPACITY)
    t0 = time.perf_counter()
    g, d = (int(x) for x in step(iq, r_small))
    compile_s = time.perf_counter() - t0

    def measure():
        t_small, _ = timed(step, iq, r_small)
        t_big, (gs, ds) = timed(step, iq, r_big)
        per_pass = (t_big - t_small) / (r_big - r_small)
        return per_pass, gs // r_big

    return measure, compile_s


def run_one(name, body, iq, n_off, r_small, r_big):
    measure, compile_s = make_timer(name, body, iq, n_off, r_small, r_big)
    per_pass, good = measure()
    return {
        "name": name,
        "seconds_per_pass": round(per_pass, 6),
        "msps": round(n_off / per_pass / 1e6, 1),
        "good_per_pass": good,
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--r-small", type=int, default=2)
    ap.add_argument("--r-big", type=int, default=12)
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--variants", default="base,ilv,dense")
    ap.add_argument("--platform", default=None, help="e.g. cpu (default: session)")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    n_off = BLOCK - WINDOW
    iq = build_iq()
    print(f"device: {jax.devices()[0]}, block={BLOCK}", flush=True)

    if args.stages:
        sb = stage_bytes(BLOCK)
        for name, body in [
            ("mag", stage_mag),
            ("detect", stage_detect),
            ("compact", stage_compact),
            ("pack", stage_pack),
            ("full", body_base),
        ]:
            r = run_one(name, body, iq, n_off, args.r_small, args.r_big)
            roof_s = sb[name] / (HBM_GBPS * 1e9)
            r["min_bytes_mb"] = round(sb[name] / 1e6, 1)
            r["roofline_s"] = round(roof_s, 6)
            r["x_roofline"] = round(r["seconds_per_pass"] / roof_s, 2)
            print(json.dumps(r), flush=True)

    # Compile every variant up front, then time them INTERLEAVED (ABAB...)
    # --repeat times each: cross-minute drift on the tunnel then hits all
    # variants equally, and per-variant best/median expose the spread.
    names = [v for v in args.variants.split(",") if v]
    timers = {}
    for name in names:
        timers[name], c = make_timer(
            name, VARIANTS[name], iq, n_off, args.r_small, args.r_big
        )
        print(f"compiled {name} in {c:.1f}s", flush=True)
    samples = {name: [] for name in names}
    for rep in range(args.repeat):
        for name in names:
            per_pass, good = timers[name]()
            samples[name].append(per_pass)
            print(
                json.dumps(
                    {
                        "name": name,
                        "rep": rep,
                        "seconds_per_pass": round(per_pass, 6),
                        "msps": round(n_off / per_pass / 1e6, 1),
                        "good_per_pass": good,
                    }
                ),
                flush=True,
            )
    for name in names:
        s = sorted(samples[name])
        best, median = s[0], s[len(s) // 2]
        print(
            json.dumps(
                {
                    "name": name,
                    "best_s": round(best, 6),
                    "median_s": round(median, 6),
                    "best_msps": round(n_off / best / 1e6, 1),
                    "median_msps": round(n_off / median / 1e6, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
