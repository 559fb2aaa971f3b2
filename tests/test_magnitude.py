"""Exact magnitude parity: isqrt formulation vs the reference's
trunc(f64 sqrt(re^2+im^2)) (src/utils.rs:46-52)."""

import numpy as np
import jax.numpy as jnp

from airjax.dsp.magnitude import magnitude_u32, isqrt_u32


def _reference_mag(iq: np.ndarray) -> np.ndarray:
    re = iq[:, 0].astype(np.float64)
    im = iq[:, 1].astype(np.float64)
    return np.sqrt(re * re + im * im).astype(np.uint32)


def test_random_parity():
    rng = np.random.default_rng(42)
    iq = rng.integers(-32768, 32768, size=(100_000, 2), dtype=np.int16)
    ours = np.asarray(magnitude_u32(jnp.asarray(iq)))
    assert np.array_equal(ours, _reference_mag(iq))


def test_extremes():
    iq = np.array(
        [
            [-32768, -32768],  # s = 2^31 exactly
            [32767, 32767],
            [-32768, 0],
            [0, 0],
            [1, 0],
            [3, 4],
            [-3, -4],
        ],
        dtype=np.int16,
    )
    ours = np.asarray(magnitude_u32(jnp.asarray(iq)))
    assert np.array_equal(ours, _reference_mag(iq))
    assert ours[3] == 0 and ours[5] == 5


def test_perfect_squares_boundary():
    # Values straddling integer sqrt boundaries: k^2-1, k^2, k^2+1
    ks = np.array([1, 2, 255, 256, 46340, 46341], dtype=np.uint64)
    s = np.concatenate([ks * ks - 1, ks * ks, ks * ks + 1]).astype(np.uint32)
    ours = np.asarray(isqrt_u32(jnp.asarray(s)))
    expect = np.sqrt(s.astype(np.float64)).astype(np.uint32)
    assert np.array_equal(ours, expect)
