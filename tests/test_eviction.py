"""Tracker scale behavior: 10k+ ICAOs, optional age-based eviction.

The reference's aircraft HashMap only ever inserts
(src/adsb/aircraft.rs:158-165) — a long-running receiver accumulates every
ICAO it has ever heard. We mirror that by default (parity), and offer an
opt-in `--evict-after SECONDS` flag (extension) that bounds the table.
"""

import time

from airjax.protocol.packet import AdsbPacket
from airjax.track.aircraft import evict_stale, handle_aircraft_update

# Valid DF17 position frame (altitude 1425 ft); ICAO bytes patched per
# plane. Position messages set last_contact from time_processed (ID
# messages do not — mirroring src/adsb/aircraft.rs).
BASE = bytes.fromhex("8d7c6b30580d107903b3cabf62ab")


def _packet(icao: int, t: float) -> AdsbPacket:
    frame = bytearray(BASE)
    frame[1:4] = icao.to_bytes(3, "big")
    return AdsbPacket.from_bytes(bytes(frame), time_processed=t)


def test_unbounded_growth_without_flag():
    """Default (parity): 10k distinct ICAOs -> 10k tracked aircraft."""
    aircrafts = {}
    t0 = 1_000_000.0
    for i in range(10_000):
        handle_aircraft_update(_packet(0x100000 + i, t0 + i * 0.01), aircrafts)
    assert len(aircrafts) == 10_000
    # Every entry decoded its altitude (the updates really ran).
    assert aircrafts[0x100000].altitude == 1425
    assert aircrafts[0x100000 + 9999].altitude == 1425


def test_evict_stale_drops_only_old():
    aircrafts = {}
    t0 = 1_000_000.0
    for i in range(100):
        handle_aircraft_update(_packet(0x200000 + i, t0 + i), aircrafts)
    # Evict everything unheard for >50 s as of t0+99 (the newest packet).
    n = evict_stale(aircrafts, 50.0, now=t0 + 99)
    assert n == 49  # ages 51..99 (strictly greater than 50)
    assert len(aircrafts) == 51
    assert 0x200000 not in aircrafts  # oldest gone
    assert 0x200000 + 99 in aircrafts  # newest kept
    # Idempotent at the same instant.
    assert evict_stale(aircrafts, 50.0, now=t0 + 99) == 0


def test_bounded_memory_with_flag():
    """Streaming 10k ICAOs with periodic eviction keeps the table bounded."""
    aircrafts = {}
    t0 = 1_000_000.0
    max_seen = 0
    for i in range(10_000):
        handle_aircraft_update(_packet(0x300000 + i, t0 + i), aircrafts)
        if i % 100 == 0:
            evict_stale(aircrafts, 300.0, now=t0 + i)
        max_seen = max(max_seen, len(aircrafts))
    # The window holds at most ~300 live + up to 100 between sweeps.
    assert max_seen <= 402
    evict_stale(aircrafts, 300.0, now=t0 + 9_999)
    assert len(aircrafts) <= 301


def test_identical_tracker_state_without_flag():
    """Feeding the same packets with eviction OFF matches a plain dict."""
    plain, gated = {}, {}
    t0 = 1_000_000.0
    pkts = [_packet(0x400000 + (i % 7), t0 + i) for i in range(50)]
    for p in pkts:
        handle_aircraft_update(p, plain)
    for p in pkts:
        handle_aircraft_update(p, gated)
        # evict_after None == never called; calling with a huge window is
        # also a no-op on this trace.
        evict_stale(gated, 1e9, now=t0 + 50)
    assert plain.keys() == gated.keys()
    for k in plain:
        assert plain[k].altitude == gated[k].altitude
        assert plain[k].last_contact == gated[k].last_contact


def test_tui_app_eviction_wiring():
    from airjax.ui.tui import TuiApp

    app = TuiApp(evict_after_s=60.0)
    now = time.time()
    app.on_packet(_packet(0x500001, now - 3600.0))  # stale
    app.on_packet(_packet(0x500002, now))  # fresh
    app._drain()
    assert set(app.aircrafts) == {0x500002}

    # Default: no eviction.
    app2 = TuiApp()
    app2.on_packet(_packet(0x500001, now - 3600.0))
    app2.on_packet(_packet(0x500002, now))
    app2._drain()
    assert set(app2.aircrafts) == {0x500001, 0x500002}


def test_web_display_eviction_wiring():
    from airjax.ui.web import WebDisplay

    disp = WebDisplay("127.0.0.1", port=0, quiet=True, evict_after_s=60.0)
    now = time.time()
    disp.on_packet(_packet(0x600001, now - 3600.0))  # stale
    disp.on_packet(_packet(0x600002, now))  # evict sweep fires here
    assert set(disp.aircrafts) == {0x600002}


def test_cli_flag_parses():
    from airjax.cli import build_parser

    args = build_parser().parse_args(
        ["adsb", "-m", "web", "--evict-after", "120"]
    )
    assert args.evict_after == 120.0
    args = build_parser().parse_args(["adsb"])
    assert args.evict_after is None
