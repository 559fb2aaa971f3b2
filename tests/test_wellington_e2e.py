"""The Wellington real-world vector, IQ -> browser (VERDICT r1 item 4).

The reference's only vector that came from a live antenna is the capture
pair in /root/reference/src/adsb/aircraft.rs:215-262:

    8d7c6b30580d107903b3cabf62ab   (even CPR frame, alt 1425 ft)
    8d7c6b30580d24eeaebb2dfea5bb   (odd  CPR frame, alt 1450 ft)
    -> ICAO 7C6B30 at (-41.28964698920816, 174.80927207253197)

Round 1 tested it only at packet level. Here the pair is MODULATED into
IQ, written to .c16, replayed through the playback source into the real
web display (the `airjax adsb -m web --playback` internals), and the
decoded position is read back over a real RFC 6455 WebSocket frame and
the /api/aircraft snapshot — the full L2->L7 stack on antenna-real data.
"""

import json
import threading
import time

import pytest

from airjax.io import synth
from airjax.io.c16 import save_c16
from airjax.io.source import playback_blocks
from airjax.runner import run_stream
from airjax.ui.web import WebDisplay

EVEN = bytes.fromhex("8d7c6b30580d107903b3cabf62ab")
ODD = bytes.fromhex("8d7c6b30580d24eeaebb2dfea5bb")
LAT = -41.28964698920816  # aircraft.rs:259
LON = 174.80927207253197  # aircraft.rs:260


@pytest.fixture(scope="module")
def wellington_c16(tmp_path_factory):
    # Even then odd, 20k samples apart (well inside the 10 s CPR window;
    # newest=odd, matching the capture order in the reference comment).
    # 60k total: playback drops the tail INCLUDING the final full chunk
    # (reference adsb.rs:77 parity), so both frames must sit in chunks 0-1.
    iq = synth.modulate([EVEN, ODD], [3000, 23000], 60000, seed=3)
    path = tmp_path_factory.mktemp("wlg") / "wellington.c16"
    save_c16(iq, path)
    return path


# Race-safe WS client helpers shared with the load tests (they hand back
# any frame bytes that arrive in the same recv as the 101 handshake).
from tests.test_web_load import _read_frames, _ws_connect  # noqa: E402


def test_wellington_iq_to_browser(wellington_c16):
    display = WebDisplay(port=0, quiet=True)
    t = threading.Thread(target=display.serve_forever, daemon=True)
    t.start()
    for _ in range(100):
        if display._httpd is not None:
            break
        time.sleep(0.05)
    port = display._httpd.server_address[1]
    ws, leftover = _ws_connect(port)

    # The exact `adsb -m web --playback` pipeline: .c16 playback blocks
    # through the jitted decode into the display sink.
    stats = run_stream(
        playback_blocks(wellington_c16, realtime_factor=None),
        display.on_packet,
    )
    assert stats.as_dict()["good"] >= 2

    # Both decoded packets were broadcast over the live WebSocket; the
    # second (odd, completing the CPR pair) must carry the position.
    frames = _read_frames(ws, 2, initial=leftover)
    ws.close()
    for f in frames:
        assert f["icao"] == 0x7C6B30
        assert set(f) == {"icao", "callsign", "altitude", "geoPosition", "lastContact"}
    final = frames[-1]
    assert final["altitude"] == 1450  # aircraft.rs:258
    assert final["geoPosition"] is not None
    assert final["geoPosition"]["latitude"] == pytest.approx(LAT, abs=1e-4)
    assert final["geoPosition"]["longitude"] == pytest.approx(LON, abs=1e-4)

    # REST snapshot agrees.
    import urllib.request

    snap = json.load(
        urllib.request.urlopen(f"http://127.0.0.1:{port}/api/aircraft", timeout=5)
    )
    (entry,) = [a for a in snap if a["icao"] == 0x7C6B30]
    assert entry["geoPosition"]["latitude"] == pytest.approx(LAT, abs=1e-4)
    assert entry["geoPosition"]["longitude"] == pytest.approx(LON, abs=1e-4)
    display.shutdown()


def test_wellington_cli_playback_jsonl(wellington_c16, tmp_path, capsys):
    """Same capture through the actual CLI (`airjax adsb -p ... --fast`)."""
    from airjax.cli import main

    out = tmp_path / "wlg.jsonl"
    rc = main(["adsb", "-p", str(wellington_c16), "--fast", "--jsonl", str(out)])
    assert rc == 0
    records = [json.loads(l) for l in out.read_text().splitlines()]
    hexes = [r["hex"] for r in records]
    assert EVEN.hex() in hexes and ODD.hex() in hexes
    alts = [r.get("altitude_ft") for r in records]
    assert 1425 in alts and 1450 in alts  # aircraft.rs:224-249 field dump


def test_wellington_cli_playback_devices(wellington_c16, tmp_path, capsys):
    """The antenna-real vector through the SHARDED product command
    (`airjax adsb -p ... --devices 2`): same decoded frames."""
    from airjax.cli import main

    out = tmp_path / "wlg_sharded.jsonl"
    rc = main(
        [
            "adsb", "-p", str(wellington_c16), "--fast",
            "--devices", "2", "--jsonl", str(out),
        ]
    )
    assert rc == 0
    records = [json.loads(l) for l in out.read_text().splitlines()]
    hexes = [r["hex"] for r in records]
    assert EVEN.hex() in hexes and ODD.hex() in hexes
