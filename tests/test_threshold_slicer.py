"""Threshold-slicer variant tests (the reference's dead code path,
vectors from src/adsb/demod.rs:281-320)."""

import numpy as np
import jax.numpy as jnp

from airjax.dsp.demod import threshold_slice_bits


def _buf_valid():
    # demod.rs:286-291: repeating (120, 50, 50, 120) pattern
    buf = np.zeros(224, dtype=np.uint32)
    buf[0::4] = 120
    buf[1::4] = 50
    buf[2::4] = 50
    buf[3::4] = 120
    return buf


def test_threshold_valid_pattern():
    mags = np.zeros(300, dtype=np.uint32)
    mags[16:240] = _buf_valid()
    # reference test passes high=100 directly to the slicer (no derate);
    # derate=1.0 reproduces that call exactly
    bits, ok = threshold_slice_bits(
        jnp.asarray(mags), jnp.asarray([0]), jnp.uint32(100), derate=1.0
    )
    assert bool(ok[0])
    # pattern decodes as alternating 1,0 (first>thr, second<thr, ...)
    assert np.array_equal(np.asarray(bits[0]), np.tile([1, 0], 56))


def test_threshold_invalid_pattern_rejected():
    # demod.rs:299-320: breaking the first three pairs -> >2 errors in byte 0
    buf = _buf_valid()
    buf[0:6] = [50, 50, 120, 120, 50, 50]
    mags = np.zeros(300, dtype=np.uint32)
    mags[16:240] = buf
    bits, ok = threshold_slice_bits(
        jnp.asarray(mags), jnp.asarray([0]), jnp.uint32(100), derate=1.0
    )
    assert not bool(ok[0])


def test_threshold_two_errors_tolerated():
    buf = _buf_valid()
    buf[0:4] = [50, 50, 120, 120]  # exactly 2 invalid pairs in byte 0
    mags = np.zeros(300, dtype=np.uint32)
    mags[16:240] = buf
    bits, ok = threshold_slice_bits(
        jnp.asarray(mags), jnp.asarray([0]), jnp.uint32(100), derate=1.0
    )
    assert bool(ok[0])
    # invalid pairs decode as bit 0
    assert int(bits[0][0]) == 0 and int(bits[0][1]) == 0


def test_derate_exactly_matches_f64_reference():
    """The u32 x*9//10 derate must equal the reference's f64 (and the
    detector's f32) truncation for EVERY value in the magnitude range."""
    import numpy as np

    x = np.arange(0, 46341, dtype=np.uint64)
    f64 = (x.astype(np.float64) * np.float64(0.9)).astype(np.uint64)
    f32 = (x.astype(np.float32) * np.float32(0.9)).astype(np.uint64)
    exact = x * 9 // 10
    np.testing.assert_array_equal(f64, exact)
    np.testing.assert_array_equal(f32, exact)


def test_derate_applied_in_slicer():
    mags = np.zeros(300, dtype=np.uint32)
    buf = _buf_valid()
    mags[16:240] = buf
    # high=112, derate 0.9 -> threshold 100 (112*9//10): same decode as
    # the direct high=100 call.
    bits, ok = threshold_slice_bits(
        jnp.asarray(mags), jnp.asarray([0]), jnp.uint32(112), derate=0.9
    )
    assert bool(ok[0])
    assert np.array_equal(np.asarray(bits[0]), np.tile([1, 0], 56))
