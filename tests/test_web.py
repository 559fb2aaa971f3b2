"""Web display server: HTTP endpoints, WebSocket handshake + broadcast,
path traversal rejection (mirrors the reference's axum/WS surface,
src/adsb/web.rs)."""

import base64
import json
import socket
import threading
import time
import urllib.error
import urllib.request

import pytest

from airjax.protocol.packet import AdsbPacket
from airjax.ui.web import WebDisplay


@pytest.fixture(scope="module")
def display():
    d = WebDisplay(port=0, quiet=True)  # port 0: pick a free port
    # ThreadingHTTPServer binds in serve_forever; start and wait for bind.
    t = threading.Thread(target=d.serve_forever, daemon=True)
    t.start()
    for _ in range(100):
        if d._httpd is not None:
            break
        time.sleep(0.05)
    assert d._httpd is not None
    d.port = d._httpd.server_address[1]
    yield d
    d.shutdown()


def _get(display, path):
    return urllib.request.urlopen(
        f"http://127.0.0.1:{display.port}{path}", timeout=5
    )


def test_api_data(display):
    body = json.load(_get(display, "/api/data"))
    assert body["id"] == 123


def test_static_and_traversal(display):
    assert b"<canvas" in _get(display, "/").read()
    assert b"airjax" in _get(display, "/app.js").read()
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(display, "/../../etc/passwd")
    assert e.value.code == 404


def test_websocket_handshake_and_broadcast(display):
    s = socket.create_connection(("127.0.0.1", display.port), timeout=5)
    key = base64.b64encode(b"0123456789abcdef").decode()
    s.sendall(
        (
            f"GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
            f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
            f"Sec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
    )
    time.sleep(0.2)
    resp = s.recv(2048).decode(errors="replace")
    assert "101" in resp.splitlines()[0]
    # RFC 6455 known-answer for this key
    assert "Sec-WebSocket-Accept: BACScCJPNqyz+UBoqMH89VmURoA=" in resp

    display.on_packet(AdsbPacket.from_hex("8d7c6b3020293532d70820fc8090"))
    s.settimeout(5)
    data = b""
    while len(data) < 4:
        data += s.recv(4096)
    ln = data[1] & 0x7F
    off = 2
    if ln == 126:
        ln = int.from_bytes(data[2:4], "big")
        off = 4
    summary = json.loads(data[off : off + ln])
    assert summary["icao"] == 0x7C6B30
    assert summary["callsign"] == "JST250__"
    assert set(summary) == {"icao", "callsign", "altitude", "geoPosition", "lastContact"}
    s.close()


def test_aircraft_snapshot_endpoint(display):
    snap = json.load(_get(display, "/api/aircraft"))
    assert any(a["icao"] == 0x7C6B30 for a in snap)


def _ws_connect(port):
    s = socket.create_connection(("127.0.0.1", port), timeout=5)
    key = base64.b64encode(b"0123456789abcdef").decode()
    s.sendall(
        (
            f"GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
            f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
            f"Sec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
    )
    time.sleep(0.2)
    resp = s.recv(2048)
    assert b"101" in resp.splitlines()[0]
    return s


def _ws_read_frames(s, min_frames, timeout=5.0):
    """Read websocket text frames until min_frames collected or timeout."""
    s.settimeout(0.3)
    data = b""
    frames = []
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            data += s.recv(65536)
        except socket.timeout:
            if len(frames) >= min_frames:
                break
            continue
        while len(data) >= 2:
            ln = data[1] & 0x7F
            off = 2
            if ln == 126:
                if len(data) < 4:
                    break
                ln = int.from_bytes(data[2:4], "big")
                off = 4
            if len(data) < off + ln:
                break
            frames.append(json.loads(data[off : off + ln]))
            data = data[off + ln :]
    return frames


def test_batched_sink_web_broadcast(display):
    """--batched web sink: tracker updates through BatchTracker against
    the display's table, ONE WS summary per touched aircraft per block
    (3 messages for one aircraft -> 1 broadcast), snapshot endpoint
    sees the aircraft."""
    from airjax.io import synth
    from airjax.runner import run_stream

    sink = display.batched_sink()
    assert hasattr(sink, "on_fields") and not hasattr(sink, "on_extended_block")
    s = _ws_connect(display.port)

    icao = 0x4840D6
    frames = [
        synth.make_df17(icao, synth.make_id_me("BATCHWS")),
        synth.make_df17(
            icao,
            synth.make_position_me(
                tc=11, altitude_ft=2600, cpr_lat=93000, cpr_lon=51372, odd=False
            ),
        ),
        synth.make_df17(
            icao,
            synth.make_position_me(
                tc=11, altitude_ft=2650, cpr_lat=74158, cpr_lon=50194, odd=True
            ),
        ),
    ]
    iq = synth.modulate(frames, [500, 4500, 9000], 12000, seed=5)
    stats = run_stream(iter([iq]), sink, overlap=True)
    assert stats.good == 3

    got = _ws_read_frames(s, min_frames=1)
    # The module-scoped display may also deliver a late-joiner snapshot
    # frame for aircraft from earlier tests; count only OUR aircraft.
    mine = [g for g in got if g["icao"] == icao]
    assert len(mine) == 1  # coalesced: one summary per aircraft per block
    assert mine[0]["callsign"] == "BATCHWS_"
    assert mine[0]["altitude"] == 2650
    assert mine[0]["geoPosition"] is not None
    snap = json.load(_get(display, "/api/aircraft"))
    assert any(a["icao"] == icao and a["callsign"] == "BATCHWS_" for a in snap)
    s.close()


def test_batched_sink_web_extended():
    """Extended batched web sink: mixed-DF stream, extended schema keys,
    one summary per touched aircraft per block."""
    from airjax.io import synth
    from airjax.protocol import shortframe
    from airjax.runner import run_stream

    d = WebDisplay(port=0, quiet=True, extended_schema=True)
    t = threading.Thread(target=d.serve_forever, daemon=True)
    t.start()
    for _ in range(100):
        if d._httpd is not None:
            break
        time.sleep(0.05)
    d.port = d._httpd.server_address[1]
    try:
        sink = d.batched_sink(extended=True)
        assert hasattr(sink, "on_extended_block")
        s = _ws_connect(d.port)
        icao = 0x7C6B30
        frames = [
            synth.make_df17(icao, synth.make_id_me("EXTWS")),
            synth.make_df17(
                icao, synth.make_velocity_me(ew_kt=120, ns_kt=0, vertical_rate_fpm=-640)
            ),
            shortframe.make_df11(0x40621D),
        ]
        iq = synth.modulate(frames, [500, 4500, 9000], 12000, seed=6)
        stats = run_stream(iter([iq]), sink, overlap=True, extended=True)
        assert stats.good == 3
        got = _ws_read_frames(s, min_frames=2)
        assert len(got) == 2  # fresh display: two aircraft -> two summaries
        by_icao = {g["icao"]: g for g in got}
        assert by_icao[icao]["callsign"] == "EXTWS___"
        assert by_icao[icao]["groundSpeedKt"] == 120.0
        assert by_icao[icao]["verticalRateFpm"] == -640
        assert 0x40621D in by_icao
        s.close()
    finally:
        d.shutdown()


def test_batched_sink_web_sharded_runner():
    """The web display's batched sink driven by the SHARDED stream
    runner (`adsb -m web --batched --devices N` composition): tracker
    state + WS broadcast work identically to the single-device runner."""
    from airjax.io import synth
    from airjax.parallel.mesh import make_mesh
    from airjax.runner import run_stream_sharded

    d = WebDisplay(port=0, quiet=True)
    t = threading.Thread(target=d.serve_forever, daemon=True)
    t.start()
    for _ in range(100):
        if d._httpd is not None:
            break
        time.sleep(0.05)
    d.port = d._httpd.server_address[1]
    try:
        sink = d.batched_sink()
        s = _ws_connect(d.port)
        icao = 0x7C0DE5
        frames = [
            synth.make_df17(icao, synth.make_id_me("SHRDWEB")),
            synth.make_df17(
                icao,
                synth.make_position_me(
                    tc=11, altitude_ft=2600, cpr_lat=93000, cpr_lon=51372,
                    odd=False,
                ),
            ),
            synth.make_df17(
                icao,
                synth.make_position_me(
                    tc=11, altitude_ft=2650, cpr_lat=74158, cpr_lon=50194,
                    odd=True,
                ),
            ),
        ]
        iq = synth.modulate(frames, [500, 4500, 9000], 12000, seed=6)
        stats = run_stream_sharded(iter([iq]), sink, mesh=make_mesh(8))
        assert stats.good == 3
        got = _ws_read_frames(s, min_frames=1)
        mine = [g for g in got if g["icao"] == icao]
        assert len(mine) == 1
        assert mine[0]["callsign"] == "SHRDWEB_"
        assert mine[0]["altitude"] == 2650
        assert mine[0]["geoPosition"] is not None
        s.close()
    finally:
        d.shutdown()
