"""Multi-host plumbing, exercised in its single-process degenerate form on
the 8-device virtual mesh (real >=2-host runs need a pod; the sharded
decoder underneath is mesh-agnostic and the halo path is covered by
tests/test_sharding.py)."""

import jax
import numpy as np

from airjax.io import synth
from airjax.parallel import multihost


def test_init_single_process():
    idx, count = multihost.init()
    assert idx == 0 and count == 1


def test_decode_capture_single_process():
    mesh = multihost.global_mesh()
    n_dev = mesh.shape["t"]
    n = 4096 * n_dev
    frame = synth.make_df17(0x7C6B30, synth.make_id_me("MHOST"))
    offsets = [700, 4096 - 100, n - 2000]  # includes a shard straddle
    iq = synth.modulate([frame] * len(offsets), offsets, n, seed=5)
    hits, stats = multihost.decode_capture(iq)
    got = {h[1] for h in hits if h[2] == frame}
    assert got >= set(offsets)
    assert stats["processes"] == 1
    assert stats["devices"] == n_dev


def test_ingest_shape_validation():
    mesh = multihost.global_mesh()
    iq = np.zeros((1024 * mesh.shape["t"], 2), np.int16)
    arr = multihost.ingest_process_local(iq, mesh)
    assert arr.shape == iq.shape
