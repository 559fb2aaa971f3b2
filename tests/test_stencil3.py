"""Attempt-3 Mosaic stencil (shift-sharing tree, int16 packing) vs the
XLA reference path — interpret mode on CPU; the TPU A/B lives in
tools/bench_stencil3.py."""

import numpy as np
import jax.numpy as jnp
import pytest

from airjax.dsp.demod import detect
from airjax.dsp.magnitude import magnitude_u32
from airjax.kernels.magdet import TILE, pad_for_kernel
from airjax.kernels.stencil3 import magdet_tree


@pytest.mark.parametrize("variant", ["tree32", "tree16", "flat16"])
def test_tree_kernel_matches_xla_path(variant):
    rng = np.random.default_rng(11)
    m = TILE + 901
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
    det_k, cmp_k = magdet_tree(padded, variant=variant, interpret=True)

    mags = np.asarray(magnitude_u32(padded))
    det_x = np.asarray(detect(jnp.asarray(mags), n_dom))
    cmp_x = (mags[:-1] > mags[1:])[:n_dom]

    assert np.array_equal(np.asarray(det_k).astype(bool), det_x)
    assert np.array_equal(np.asarray(cmp_k).astype(bool), cmp_x)


def test_tree_kernel_detects_real_frames():
    """Synthetic DF17 traffic: the tree kernel's detection mask must match
    the XLA stencil exactly where real frames are embedded (ties included:
    equal-magnitude buckets pass the >= gate)."""
    from airjax.io import synth
    from airjax.kernels.magdet import EXTRA

    frame = synth.make_df17(0x7C6B30, synth.make_id_me("TREE000"))
    n = TILE + EXTRA
    iq = synth.modulate(
        [frame] * 5, [1000, 9000, 20000, 40000, 60000], n, noise_std=40.0, seed=3
    )
    det_k, _ = magdet_tree(jnp.asarray(iq), variant="tree16", interpret=True)
    mags = magnitude_u32(jnp.asarray(iq))
    det_x = detect(mags, TILE)
    assert np.array_equal(np.asarray(det_k).astype(bool), np.asarray(det_x))
    assert int(np.asarray(det_k).sum()) >= 5
