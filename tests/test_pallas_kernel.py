"""Pallas fused magdet kernel vs the XLA reference path (interpret mode on
CPU; the same comparison runs on real TPU hardware in benchmarks)."""

import numpy as np
import jax.numpy as jnp

from airjax.dsp.demod import detect
from airjax.dsp.magnitude import magnitude_u32
from airjax.kernels.magdet import EXTRA, TILE, magdet_fused, pad_for_kernel


def test_kernel_matches_xla_path():
    rng = np.random.default_rng(0)
    m = TILE + 777
    iq_np = rng.integers(-32768, 32768, size=(m, 2), dtype=np.int16)
    iq_np[:8] = [
        [-32768, -32768],
        [32767, 32767],
        [0, 0],
        [1, 0],
        [-32768, 0],
        [3, 4],
        [255, 255],
        [256, 256],
    ]
    padded, n_dom = pad_for_kernel(jnp.asarray(iq_np))
    det_k, cmp_k = magdet_fused(padded, interpret=True)

    mags = np.asarray(magnitude_u32(padded))
    det_x = np.asarray(detect(jnp.asarray(mags), n_dom))
    cmp_x = (mags[:-1] > mags[1:])[:n_dom]

    assert np.array_equal(np.asarray(det_k).astype(bool), det_x)
    assert np.array_equal(np.asarray(cmp_k).astype(bool), cmp_x)


def test_pad_for_kernel_geometry():
    iq = jnp.zeros((TILE + 1, 2), jnp.int16)
    padded, n_dom = pad_for_kernel(iq)
    assert n_dom == 2 * TILE
    assert padded.shape[0] == n_dom + EXTRA
