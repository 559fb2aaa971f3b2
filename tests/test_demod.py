"""Detector/bit-slicer tests (patterns from src/adsb/demod.rs:246-381)."""

import numpy as np
import jax.numpy as jnp

from airjax.dsp import demod


def _preamble_buf(high=1000, low=500, n=32):
    buf = np.full(n, 0, dtype=np.uint32)
    for i in demod.PREAMBLE_HIGHS:
        buf[i] = high
    for i in (1, 3, 4, 5, 6, 8, 10, 11, 12, 13, 14, 15):
        buf[i] = low
    # make the DF17 window pass too: highs at +16 indices
    for i in demod.DF17_HIGHS:
        buf[i] = high
    for i in demod.DF17_LOWS:
        buf[i] = low
    return buf


def test_detect_valid():
    mags = np.zeros(300, dtype=np.uint32)
    mags[:32] = _preamble_buf()
    det = np.asarray(demod.detect(jnp.asarray(mags), 60))
    assert det[0]


def test_detect_invalid_inverted():
    # lows higher than highs -> reject (src/adsb/demod.rs:267-278)
    mags = np.zeros(300, dtype=np.uint32)
    buf = _preamble_buf(high=500, low=1000)
    mags[:32] = buf
    det = np.asarray(demod.detect(jnp.asarray(mags), 60))
    assert not det[0]


def test_detect_equal_high_low_accepts():
    # The reference uses strict `<` for rejection, so equality passes.
    mags = np.zeros(300, dtype=np.uint32)
    mags[:32] = _preamble_buf(high=700, low=700)
    det = np.asarray(demod.detect(jnp.asarray(mags), 60))
    assert det[0]


def test_detect_df17_gate():
    # Valid preamble but DF pattern broken -> reject.
    mags = np.zeros(300, dtype=np.uint32)
    buf = _preamble_buf()
    buf[17] = 2000  # a DF "low" above every high
    mags[:32] = buf
    det = np.asarray(demod.detect(jnp.asarray(mags), 60))
    assert not det[0]


def test_slice_bits_alternating():
    # (high, low) pair -> bit 1; (low, high) -> bit 0.
    mags = np.zeros(300, dtype=np.uint32)
    data = np.zeros(224, dtype=np.uint32)
    data[0::4] = 120  # bit pattern 1,0,1,0,... : pairs (120,50),(50,120)
    data[1::4] = 50
    data[2::4] = 50
    data[3::4] = 120
    mags[16:240] = data
    bits = np.asarray(demod.slice_bits(jnp.asarray(mags), jnp.asarray([0])))
    assert bits.shape == (1, 112)
    assert np.array_equal(bits[0], np.tile([1, 0], 56))


def test_slice_bits_ties_give_zero():
    # equal pair -> `buf[i] > buf[i+1]` false -> bit 0 (relative slicer
    # semantics, demod.rs:106-112 + decode fold 180-201)
    mags = np.full(300, 77, dtype=np.uint32)
    bits = np.asarray(demod.slice_bits(jnp.asarray(mags), jnp.asarray([0])))
    assert not bits.any()


def test_compact_detections_order_and_overflow():
    det = np.zeros(100, dtype=bool)
    det[[3, 7, 50, 99]] = True
    offs, valid, n = (
        np.asarray(x)
        for x in demod.compact_detections(jnp.asarray(det), 3)
    )
    assert n == 4
    assert list(offs) == [3, 7, 50]
    assert valid.all()
