"""Execute the SoapySDR ctypes FFI against the fake C-ABI double.

VERDICT r1 item 2: airjax/sdr.py was written against the SoapySDR 0.8
C ABI but never executed (no library in the image). native/fake_soapysdr.c
implements exactly the symbols sdr.py binds — one fake rtlsdr that logs
every configuration call and streams deterministic CS16 from a .c16 file —
so every argtype/restype declaration runs here, end to end through
`airjax list` / `airjax adsb` / `airjax receive` (reference path:
src/sdr.rs:4-45 + src/adsb.rs:27-73 + src/receive.rs:17-48).
"""

from __future__ import annotations

import itertools
import json
import pathlib
import subprocess

import numpy as np
import pytest

REPO = pathlib.Path(__file__).parent.parent
FAKE_LIB = REPO / "native" / "libfake_soapysdr.so"

CALLSIGN = "FAKESDR_"


@pytest.fixture(scope="module")
def fake_lib() -> pathlib.Path:
    subprocess.run(
        ["make", "-C", str(REPO / "native"), "libfake_soapysdr.so"],
        check=True,
        capture_output=True,
    )
    assert FAKE_LIB.exists()
    return FAKE_LIB


@pytest.fixture(scope="module")
def fake_capture(tmp_path_factory) -> pathlib.Path:
    """A 20k-sample .c16 (= one fake MTU block, cycled forever) holding
    three modulated DF17 identification frames."""
    from airjax.io import synth
    from airjax.io.c16 import save_c16

    frame = synth.make_df17(0x7C0DEF, synth.make_id_me(CALLSIGN))
    iq = synth.modulate([frame] * 3, [1000, 7000, 13000], 20000, seed=11)
    path = tmp_path_factory.mktemp("sdr") / "fake.c16"
    save_c16(iq, path)
    return path


@pytest.fixture
def fake_env(fake_lib, fake_capture, tmp_path, monkeypatch) -> pathlib.Path:
    log = tmp_path / "soapy.log"
    monkeypatch.setenv("AIRJAX_SOAPY_LIB", str(fake_lib))
    monkeypatch.setenv("AIRJAX_FAKE_SOAPY_C16", str(fake_capture))
    monkeypatch.setenv("AIRJAX_FAKE_SOAPY_LOG", str(log))
    return log


def test_list_devices(fake_env, capsys):
    from airjax.cli import main

    assert main(["list"]) == 0
    assert "0: device 0" in capsys.readouterr().out
    assert "enumerate -> 1 device" in fake_env.read_text()
    assert "kwargslist_clear len=1" in fake_env.read_text()


def test_source_configures_and_streams(fake_env, fake_capture):
    """Every ctypes signature runs; configured values survive marshalling;
    streamed blocks are byte-identical to the backing capture (with the
    injected read error skipped, src/adsb.rs:70 semantics)."""
    from airjax import sdr
    from airjax.io.c16 import load_c16

    src = sdr.SdrSource(device=0)
    blocks = list(itertools.islice(src.blocks(), 5))
    src.close()

    reference = load_c16(fake_capture)
    for b in blocks:
        assert b.shape == (20000, 2) and b.dtype == np.int16
        np.testing.assert_array_equal(b, reference)  # cycles one MTU block

    log = fake_env.read_text()
    assert 'makeStrArgs args="driver=rtlsdr,rtl=0"' in log
    # Doubles crossed the FFI intact (reference constants, src/adsb.rs:27-44).
    assert "setGainElement dir=1 chan=0 name=TUNER value=49.50" in log
    assert "setFrequency dir=1 chan=0 freq=1090000000.0" in log
    assert "setSampleRate dir=1 chan=0 rate=2000000.0" in log
    assert "setupStream dir=1 format=CS16 chan0=0 nchans=1" in log
    assert "activateStream flags=0 timeNs=0 numElems=0" in log
    # close() tears down in order; 6 reads = 5 blocks + 1 injected error.
    assert "deactivateStream" in log
    assert "closeStream reads=6" in log
    assert log.index("deactivateStream") < log.index("closeStream")
    assert "unmake" in log


def test_default_device_args(fake_env):
    from airjax import sdr

    src = sdr.SdrSource()  # no explicit index -> empty makeStrArgs args
    src.close()
    assert 'makeStrArgs args=""' in fake_env.read_text()


def test_adsb_live_decodes_fake_frames(fake_env, tmp_path, capsys):
    """`airjax adsb` end to end off the fake SDR: enumerate -> configure ->
    stream -> decode the modulated frames (the VERDICT item's done bar)."""
    from airjax.cli import main

    out = tmp_path / "decoded.jsonl"
    rc = main(["adsb", "--max-blocks", "4", "-m", "stream", "--jsonl", str(out)])
    assert rc == 0
    decoded = [json.loads(l) for l in out.read_text().splitlines()]
    assert decoded, "no packets decoded from the fake SDR stream"
    assert any(p.get("callsign") == CALLSIGN for p in decoded)
    assert all(p["icao"] == f"{0x7C0DEF:06x}" for p in decoded)
    assert "stats:" in capsys.readouterr().out


def test_receive_captures_to_c16(fake_env, tmp_path, monkeypatch, capsys):
    """`airjax receive` off the fake SDR writes a loadable .c16 capture
    whose content is the fake stream (src/receive.rs:17-48)."""
    from airjax.cli import main
    from airjax.io.c16 import load_c16

    monkeypatch.chdir(tmp_path)
    rc = main(["receive", "1090000000.0", "2000000.0", "49.5", "1", "-d", "0"])
    assert rc == 0
    assert "saved" in capsys.readouterr().out
    cap = load_c16(tmp_path / "data_1090000000.0_2000000.0_49.5")
    assert len(cap) >= 20000 and cap.dtype == np.int16
    # First MTU block of the capture = the backing pattern.
    first = cap[:20000]
    assert first.max() > 5000  # the modulated frames are present


def test_ringbuffered_stream_matches_plain(fake_env, fake_capture):
    """blocks_ringbuffered (rx thread -> native SPSC ring) must deliver
    the same sample stream as the plain iterator — this is the CLI's
    live path (airjax.cli._sdr_blocks)."""
    import itertools

    import numpy as np

    from airjax import sdr

    src = sdr.SdrSource(device=0)
    plain = list(itertools.islice(src.blocks(), 6))
    src.close()

    src2 = sdr.SdrSource(device=0)
    ringed = list(itertools.islice(src2.blocks_ringbuffered(), 6))
    src2.close()

    # The fake cycles one capture deterministically from its start, so
    # block-for-block the two iterators see identical samples.
    assert len(plain) == len(ringed) == 6
    for a, b in zip(plain, ringed):
        np.testing.assert_array_equal(a, b)


def test_ringbuffered_live_decode(fake_env):
    """End-to-end: ring-buffered live source through run_stream decodes
    the capture's embedded frames with zero loss."""
    import itertools

    from airjax import sdr
    from airjax.runner import run_stream

    src = sdr.SdrSource(device=0)
    got = []
    stats = run_stream(
        itertools.islice(src.blocks_ringbuffered(), 40),
        lambda p: got.append(p.icao),
        overlap=True,
    )
    src.close()
    assert stats.blocks == 40
    assert len(got) == stats.good > 0
    assert set(got) == {0x7C0DEF}
