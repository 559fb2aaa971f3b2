"""CLI surface tests (mirrors src/cli.rs subcommands + error paths)."""

import contextlib
import io
import json
import os

import numpy as np
import pytest

from airjax.cli import main
from airjax.io.c16 import load_c16, save_c16
from airjax.io import synth


def _run(args):
    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        try:
            rc = main(args)
        except SystemExit as e:
            rc = e.code
    return rc, out.getvalue(), err.getvalue()


def test_receive_synthetic_and_playback(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc, out, _ = _run(["receive", "2000000.0", "2000000.0", "49.5", "1", "--synthetic"])
    assert rc == 0
    name = "data_2000000.0_2000000.0_49.5"
    assert os.path.exists(name)
    assert len(load_c16(name)) == 2_000_000

    rc, out, _ = _run(["adsb", "-p", name, "--fast", "-m", "stream"])
    assert rc == 0
    assert out.count("== ") > 50  # packets printed
    assert "stats:" in out


def test_adsb_synthetic_jsonl(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc, out, _ = _run(["adsb", "--synthetic", "3", "--jsonl", "pkts.jsonl"])
    assert rc == 0
    lines = [json.loads(l) for l in open("pkts.jsonl")]
    assert lines and all(l["df"] == 17 for l in lines)


def test_missing_playback_file():
    rc, _, err = _run(["adsb", "-p", "/nonexistent.c16", "--fast"])
    assert rc == 1
    assert "couldn't load playback data file" in err


def test_truncated_c16(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    open("bad.c16", "wb").write(b"\x01\x02\x03")
    rc, _, err = _run(["adsb", "-p", "bad.c16", "--fast"])
    assert rc == 1
    assert "not divisible by 4" in err


def test_tiny_capture_empty_stats(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    save_c16(np.zeros((100, 2), np.int16), "tiny.c16")
    rc, out, _ = _run(["adsb", "-p", "tiny.c16", "--fast"])
    assert rc == 0
    assert "'blocks': 0" in out


def test_no_source_error():
    rc, _, err = _run(["adsb"])
    assert rc == 1
    assert "--playback" in err or "--synthetic" in err


def test_no_overlap_drops_boundary(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    frame = synth.make_df17(0x7C6B30, synth.make_id_me("CLIBND"))
    iq = synth.modulate([frame], [20000 - 120], 60001, seed=0)
    save_c16(iq, "b.c16")
    rc, out_overlap, _ = _run(["adsb", "-p", "b.c16", "--fast"])
    rc2, out_parity, _ = _run(["adsb", "-p", "b.c16", "--fast", "--no-overlap"])
    assert out_overlap.count("== ") == 1
    assert out_parity.count("== ") == 0


def test_ref_flags_must_come_together(capsys):
    from airjax.cli import main

    rc = main(["adsb", "--synthetic", "1", "--ref-lat", "52.3"])
    assert rc == 2
    assert "--ref-lon" in capsys.readouterr().err
