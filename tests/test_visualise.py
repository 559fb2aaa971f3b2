"""airjax.visualise — the debug plotting/printing module (VERDICT r3
item 5: the last wired product module without tests, plus the textual
preamble dump mirroring the reference's print helpers,
src/visualise.rs:38-62 and src/adsb/demod.rs:209-244)."""

import contextlib
import io
import os
import xml.etree.ElementTree as ET

import numpy as np

from airjax import golden, visualise
from airjax.io import synth


def _detection_window(n: int = 4000):
    frame = synth.make_df17(0x7C6B30, synth.make_id_me("VIZTEST"))
    iq = synth.modulate([frame], [500], n, seed=31)
    return golden.magnitude(iq[500 : 500 + 240])


def test_plot_adsb_frame_writes_parseable_svg(tmp_path):
    mags = _detection_window()
    path = visualise.plot_adsb_frame(
        mags, out_dir=tmp_path, detection_offset=0, title="frame @ 500"
    )
    assert os.path.exists(path) and path.endswith(".svg")
    root = ET.parse(path).getroot()
    assert root.tag.endswith("svg")
    assert os.path.getsize(path) > 1000  # bars actually rendered


def test_plot_adsb_frame_custom_name(tmp_path):
    path = visualise.plot_adsb_frame(
        np.zeros(16), out_dir=tmp_path, name="zero.svg"
    )
    assert path.endswith("zero.svg")
    ET.parse(path)  # flat-zero input still renders valid SVG


def test_format_preamble_table():
    mags = np.array([100, 0, 0, 98, 0, 0, 0, 99, 97, 0, 0, 0, 0, 0, 0, 0])
    out = visualise.format_preamble(mags)
    values, indices = out.splitlines()
    # Reference format ' {:^5} ': 7 chars per sample, 16 samples.
    assert len(values) == len(indices) == 7 * 16
    assert values.split() == [str(int(m)) for m in mags]
    assert indices.split() == [str(i) for i in range(16)]


def test_format_preamble_graph_levels():
    mags = np.array([0, 800] + [0] * 14)
    g = visualise.format_preamble_graph(mags)
    assert len(g) == 16
    assert g[1] == "█" and g[0] == "▁"
    # All-zero input degrades to the floor row, no div-by-zero.
    assert visualise.format_preamble_graph(np.zeros(16)) == "▁" * 16
    # A real preamble puts its four pulses above the floor.
    real = visualise.format_preamble_graph(_detection_window()[:16])
    assert sum(c != "▁" for c in real) >= 4


def test_dump_preamble_composition():
    out = visualise.dump_preamble(_detection_window()[:16], offset=500)
    lines = out.splitlines()
    assert lines[0] == "preamble @ 500"
    assert len(lines) == 4  # header + graph + values + indices
    # Without an offset, no header line.
    assert len(visualise.dump_preamble(np.zeros(16)).splitlines()) == 3


def test_format_preamble_ascii():
    mags = np.array([10, 0, 0, 9, 0, 0, 0, 10, 10, 0, 0, 0, 0, 0, 0, 0])
    marks, ruler = visualise.format_preamble_ascii(mags, 5.0).splitlines()
    assert marks == "+--+---++-------"
    assert ruler == "0123456789012345"


def test_cli_dump_preamble_stream(tmp_path, monkeypatch):
    from airjax.cli import main

    monkeypatch.chdir(tmp_path)
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(["adsb", "--synthetic", "2", "-m", "stream", "--dump-preamble"])
    assert rc == 0
    text = out.getvalue()
    assert "preamble @ " in text
    assert "▁" in text  # block graph rendered
    assert "== " in text  # the packet dumps still stream


def test_cli_plot_dir_writes_svgs(tmp_path, monkeypatch):
    from airjax.cli import main

    monkeypatch.chdir(tmp_path)
    os.mkdir("plots")
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(["adsb", "--synthetic", "2", "-m", "stream", "--plot-dir", "plots"])
    assert rc == 0
    svgs = [f for f in os.listdir("plots") if f.endswith(".svg")]
    assert svgs
    ET.parse(os.path.join("plots", svgs[0]))
