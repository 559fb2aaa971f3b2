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


def test_packed_kernel_matches_xla_decode():
    """The fully-fused path (magdet_packed + sparse-byte slicing) must
    produce the identical candidate dict to the XLA pipeline, including on
    IQ containing real decodable frames."""
    import jax

    from airjax.io import synth
    from airjax.pipeline import decode_iq_block, decode_iq_block_kernel

    rng = np.random.default_rng(42)
    frame = synth.make_df17(0x7C6B30, synth.make_id_me("FUSED00"))
    n = TILE + EXTRA
    iq = synth.modulate(
        [frame] * 5, [1000, 9000, 20000, 40000, 60000], n, noise_std=40.0, seed=7
    )
    n_off = TILE - 240
    out_x = jax.device_get(decode_iq_block(jnp.asarray(iq), n_off, 64))
    out_k = jax.device_get(
        decode_iq_block_kernel(jnp.asarray(iq), n_off, 64, interpret=True)
    )
    np.testing.assert_array_equal(out_x["offsets"], out_k["offsets"])
    np.testing.assert_array_equal(out_x["good"], out_k["good"])
    np.testing.assert_array_equal(out_x["frames"], out_k["frames"])
    np.testing.assert_array_equal(out_x["recovered"], out_k["recovered"])
    assert int(out_x["n_detections"]) == int(out_k["n_detections"])
    assert int(out_k["n_good"]) >= 5


def test_packed_kernel_random_noise_parity():
    """Pure-noise fuzz: detection mask + sliced bits agree bit-exactly."""
    import jax

    from airjax.pipeline import decode_iq_block, decode_iq_block_kernel

    rng = np.random.default_rng(3)
    n = TILE + EXTRA
    iq = rng.integers(-300, 300, size=(n, 2), dtype=np.int16)
    n_off = TILE - 240
    out_x = jax.device_get(decode_iq_block(jnp.asarray(iq), n_off, 256))
    out_k = jax.device_get(
        decode_iq_block_kernel(jnp.asarray(iq), n_off, 256, interpret=True)
    )
    np.testing.assert_array_equal(out_x["offsets"], out_k["offsets"])
    np.testing.assert_array_equal(out_x["good"], out_k["good"])
    np.testing.assert_array_equal(out_x["frames"], out_k["frames"])
