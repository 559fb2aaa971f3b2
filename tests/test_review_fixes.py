"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest

from airjax.config import PipelineConfig
from airjax.io import synth
from airjax.protocol.packet import AdsbPacket
from airjax.runner import run_stream

FRAME = synth.make_df17(0x7C6B30, synth.make_id_me("RVWFIX"))


def test_extended_mode_overflow_regrows():
    # 40 frames in one block with capacity 16: extended mode must regrow
    # capacity instead of silently dropping frames.
    offsets = [300 + 400 * i for i in range(40)]
    iq = synth.modulate([FRAME] * 40, offsets, 20000, seed=0)
    got = []
    run_stream(
        iter([iq]),
        got.append,
        overlap=False,
        extended=True,
        cfg=PipelineConfig(max_candidates=16),
    )
    ours = [p for p in got if isinstance(p, AdsbPacket) and p.packet == FRAME]
    assert len(ours) == 40


def test_initial_carry_not_detecting():
    # The zero-carry bug produced ~214 bogus detections at stream start.
    iq = synth.modulate([FRAME], [500], 4000, seed=1)
    got = []
    stats = run_stream(iter([iq]), got.append, overlap=True)
    assert stats.detections < 50  # was ~254 with a zero carry
    assert any(p.packet == FRAME for p in got)


def test_short_blocks_accumulate_in_overlap_mode():
    # A stream delivered in sub-window slivers must still decode frames,
    # including one placed across sliver boundaries.
    iq = synth.modulate([FRAME, FRAME], [100, 700], 2000, seed=2)
    slivers = [iq[i : i + 100] for i in range(0, 2000, 100)]
    got = []
    run_stream(iter(slivers), got.append, overlap=True)
    assert sum(1 for p in got if p.packet == FRAME) == 2


def test_sharded_overflow_regrows():
    import jax

    from airjax.parallel.halo import decode_capture_sharded
    from airjax.parallel.mesh import make_mesh

    mesh = make_mesh(min(8, len(jax.devices())))
    n_dev = mesh.shape["t"]
    n = 4096 * n_dev
    offsets = [50 + 300 * i for i in range(10)]  # 10 frames in shard 0
    iq = synth.modulate([FRAME] * 10, offsets, n, seed=3)
    hits, stats = decode_capture_sharded(iq, mesh, capacity_per_shard=4)
    got = {h[1] for h in hits if h[2] == FRAME}
    assert got >= set(offsets)
    assert not stats["overflow"]


def test_channels_overflow_regrows():
    import jax

    from airjax.parallel.channels import decode_channels
    from airjax.parallel.mesh import make_mesh

    mesh = make_mesh(min(8, len(jax.devices())), axis="c")
    c = mesh.shape["c"]
    offsets = [50 + 300 * i for i in range(10)]
    ch0 = synth.modulate([FRAME] * 10, offsets, 4000, seed=4)
    quiet = synth.modulate([], [], 4000, seed=5)
    iq = np.stack([ch0] + [quiet] * (c - 1))
    results = decode_channels(iq, mesh, capacity=4)
    got = {h[1] for h in results[0] if h[2] == FRAME}
    assert got >= set(offsets)


def test_web_sibling_dir_not_served(tmp_path):
    import pathlib
    import threading
    import time
    import urllib.error
    import urllib.request

    from airjax.ui import web as web_mod
    from airjax.ui.web import WebDisplay

    sibling = web_mod._STATIC_DIR.parent / "static_sibling_test"
    sibling.mkdir(exist_ok=True)
    (sibling / "secret.txt").write_text("leak")
    try:
        d = WebDisplay(port=0, quiet=True)
        t = threading.Thread(target=d.serve_forever, daemon=True)
        t.start()
        for _ in range(100):
            if d._httpd is not None:
                break
            time.sleep(0.05)
        port = d._httpd.server_address[1]
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/../static_sibling_test/secret.txt",
                timeout=5,
            )
        assert e.value.code == 404
        d.shutdown()
    finally:
        (sibling / "secret.txt").unlink(missing_ok=True)
        sibling.rmdir()


def test_fused_parity_stats_match_hits():
    from airjax.pipeline import decode_capture_parity

    iq = synth.modulate([FRAME, FRAME], [20000 - 120, 25000], 60001, seed=6)
    hits, stats = decode_capture_parity(iq)
    assert stats["n_good"] == len(hits)
    assert stats["n_recovered"] == sum(1 for h in hits if h[3])
