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
