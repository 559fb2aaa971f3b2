"""Tracker checkpoint/resume (airjax.track.state) — extension tests.

The reference persists only .c16 captures; airjax snapshots the whole
aircraft table, including the stashed odd/even CPR frames, so a restart
resumes pairing mid-pair.
"""

import json

import pytest

from airjax.protocol.packet import AdsbPacket
from airjax.track import state
from airjax.track.aircraft import Aircraft, handle_aircraft_update

# The reference's own integration vectors (src/adsb/aircraft.rs:202-212):
# textbook even/odd pair decoding to (52.25720, 3.91937) [code behavior].
EVEN_HEX = "8D40621D58C382D690C8AC2863A7"
ODD_HEX = "8D40621D58C386435CC412692AD6"
ID_HEX = "8D4840D6202CC371C32CE0576098"


def test_roundtrip_preserves_fields(tmp_path):
    aircrafts: dict[int, Aircraft] = {}
    handle_aircraft_update(AdsbPacket.from_hex(ID_HEX, 100.0), aircrafts)
    handle_aircraft_update(AdsbPacket.from_hex(EVEN_HEX, 101.0), aircrafts)
    handle_aircraft_update(AdsbPacket.from_hex(ODD_HEX, 102.0), aircrafts)
    a = aircrafts[0x40621D]
    assert a.geo_position is not None

    path = tmp_path / "state.json"
    state.save_state(aircrafts, path)
    back = state.load_state(path)

    assert set(back) == set(aircrafts)
    b = back[0x40621D]
    assert b.altitude == a.altitude
    assert b.geo_position.latitude == pytest.approx(a.geo_position.latitude)
    assert b.geo_position.longitude == pytest.approx(a.geo_position.longitude)
    assert b.last_even_packet == a.last_even_packet
    assert b.last_odd_packet == a.last_odd_packet
    assert back[0x4840D6].callsign == aircrafts[0x4840D6].callsign == "KLM1023_"


def test_resume_continues_cpr_pairing(tmp_path):
    """An even frame stashed before the checkpoint pairs with an odd
    frame decoded after the restore."""
    aircrafts: dict[int, Aircraft] = {}
    handle_aircraft_update(AdsbPacket.from_hex(EVEN_HEX, 100.0), aircrafts)
    assert aircrafts[0x40621D].geo_position is None  # only one parity yet

    path = tmp_path / "state.json"
    state.save_state(aircrafts, path)
    resumed = state.load_state(path)

    handle_aircraft_update(AdsbPacket.from_hex(ODD_HEX, 104.0), resumed)
    geo = resumed[0x40621D].geo_position
    assert geo is not None

    # Bit-identical to an uninterrupted session decoding the same pair.
    fresh: dict[int, Aircraft] = {}
    handle_aircraft_update(AdsbPacket.from_hex(EVEN_HEX, 100.0), fresh)
    handle_aircraft_update(AdsbPacket.from_hex(ODD_HEX, 104.0), fresh)
    ref = fresh[0x40621D].geo_position
    assert (geo.latitude, geo.longitude) == (ref.latitude, ref.longitude)


def test_version_check_and_atomicity(tmp_path):
    path = tmp_path / "state.json"
    path.write_text(json.dumps({"version": 999, "aircraft": []}))
    with pytest.raises(ValueError):
        state.load_state(path)

    # save_state over a corrupt file replaces it atomically.
    state.save_state({}, path)
    assert state.load_state(path) == {}
    assert not list(tmp_path.glob(".airjax_state.*"))  # no temp litter


def test_extension_fields_roundtrip(tmp_path):
    a = Aircraft(0xABCDEF)
    a.squawk = 7700
    a.ground_speed_kt = 412.5
    a.vertical_rate_fpm = -640
    a.on_ground = False
    a.acas_ra = {"advisories": ["corrective"], "complements": [],
                 "terminated": False, "multiple_threats": False,
                 "threat_type": 0, "ara": 0, "rac": 0}
    path = tmp_path / "s.json"
    state.save_state({a.icao: a}, path)
    b = state.load_state(path)[0xABCDEF]
    assert b.squawk == 7700 and b.ground_speed_kt == 412.5
    assert b.vertical_rate_fpm == -640 and b.acas_ra == a.acas_ra


def _raise_interrupt(_seconds):
    raise KeyboardInterrupt


def test_cli_state_flag_web_mode(tmp_path, capsys, monkeypatch):
    """adsb -m web --state FILE restores then saves on source exhaustion."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from airjax.cli import main

    # Seed a state file with one aircraft.
    a = Aircraft(0x123456)
    a.callsign = "SAVEDAC_"
    seed = tmp_path / "tracker.json"
    state.save_state({a.icao: a}, seed)

    # After the synthetic source is exhausted, web mode parks in a
    # sleep(1) loop; nothing else on this path sleeps, so simulate the
    # user's Ctrl-C there.
    import time

    monkeypatch.setattr(time, "sleep", _raise_interrupt)
    rc = main(
        ["adsb", "--synthetic", "1", "-m", "web", "--port", "0",
         "--state", str(seed)]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "restored 1 aircraft" in out
    assert "saved" in out
    # The decoded synthetic traffic joined the restored aircraft.
    back = state.load_state(seed)
    assert 0x123456 in back and len(back) >= 2


def test_checkpoint_roundtrips_batched_stash(tmp_path):
    """A tracker fed through the batched path stashes CprStash tuples;
    the checkpoint must serialize them (review fix: asdict crashed) and
    restore them in a form BOTH paths can pair against."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from airjax.io import synth
    from airjax.protocol.fields import extract_fields
    from airjax.track.batch import BatchTracker, CprStash
    from airjax.track.state import load_state, save_state

    bt = BatchTracker()
    f = synth.make_df17(
        0x4840D6,
        synth.make_position_me(
            tc=11, altitude_ft=38000, cpr_lat=93000, cpr_lon=51372, odd=False
        ),
    )
    arr = np.frombuffer(f, np.uint8).reshape(1, 14)
    fields = jax.device_get(extract_fields(jnp.asarray(arr)))
    bt.on_fields(fields, np.arange(1), 500.0)
    assert isinstance(bt.aircrafts[0x4840D6].last_even_packet, CprStash)

    path = tmp_path / "state_batched.json"
    save_state(bt.aircrafts, path)
    restored = load_state(path)
    stash = restored[0x4840D6].last_even_packet
    assert stash == CprStash(93000, 51372)
    assert stash.cpr_latitude == 93000  # attribute access (handle_packet)

    # The restored stash pairs with a per-packet odd frame.
    from airjax.protocol.packet import AdsbPacket
    from airjax.track.aircraft import handle_aircraft_update

    f_odd = synth.make_df17(
        0x4840D6,
        synth.make_position_me(
            tc=11, altitude_ft=38000, cpr_lat=74158, cpr_lon=50194, odd=True
        ),
    )
    handle_aircraft_update(AdsbPacket.from_bytes(f_odd, 501.0), restored)
    geo = restored[0x4840D6].geo_position
    assert geo is not None and abs(geo.latitude - 52.26578) < 1e-3


def test_midstream_kill_and_resume_e2e(tmp_path):
    """Operational checkpoint story (VERDICT r3 item 6): stream a capture
    through run_stream, stop after N blocks (a kill), snapshot, restart a
    fresh process-equivalent with the restored table and the remaining
    blocks — the final aircraft table must equal the uninterrupted run,
    INCLUDING a CPR pair whose even frame arrived before the restart and
    whose odd frame arrives after it, through both the per-packet and the
    batched sink."""
    import numpy as np

    from airjax.io import synth
    from airjax.runner import run_stream
    from airjax.track.batch import BatchTracker, mirror_stash

    chunk, n_chunks = 4000, 4
    n = chunk * n_chunks
    icao2 = 0xABCDEF
    frames = [
        synth.make_df17(0x40621D, synth.make_id_me("RESUME")),
        bytes.fromhex(EVEN_HEX),  # even frame BEFORE the kill point
        synth.make_df17(icao2, synth.make_id_me("OTHER")),
        bytes.fromhex(ODD_HEX),  # odd frame AFTER the restart
    ]
    # Interrupt after chunk 2: even in chunk 1, odd in chunk 3, nothing
    # straddling the kill boundary (a restart legitimately drops the
    # overlap carry, so a straddler would differ by design).
    offsets = [600, chunk + 600, 2 * chunk + 600, 3 * chunk + 600]
    iq = synth.modulate(frames, offsets, n, seed=41)
    chunks = [iq[i : i + chunk] for i in range(0, n, chunk)]
    kill_after = 3  # blocks consumed before the "kill"

    def table_equal(a_tab, b_tab):
        assert a_tab.keys() == b_tab.keys()
        for icao, a in a_tab.items():
            b = b_tab[icao]
            assert a.callsign == b.callsign, hex(icao)
            assert a.altitude == b.altitude, hex(icao)
            mirror_stash(a), mirror_stash(b)
            assert a.last_even_packet == b.last_even_packet, hex(icao)
            assert a.last_odd_packet == b.last_odd_packet, hex(icao)
            assert (a.geo_position is None) == (b.geo_position is None)
            if a.geo_position is not None:
                assert a.geo_position.latitude == b.geo_position.latitude
                assert a.geo_position.longitude == b.geo_position.longitude

    for batched in (False, True):
        # --- uninterrupted run ---
        if batched:
            full = BatchTracker()
            run_stream(iter(chunks), full, overlap=True)
            full_tab = full.aircrafts
        else:
            full_tab = {}
            run_stream(
                iter(chunks),
                lambda p: handle_aircraft_update(p, full_tab),
                overlap=True,
            )
        assert full_tab[0x40621D].geo_position is not None

        # --- interrupted run: kill, snapshot, restore, resume ---
        if batched:
            part = BatchTracker()
            run_stream(iter(chunks[:kill_after]), part, overlap=True)
            part_tab = part.aircrafts
        else:
            part_tab = {}
            run_stream(
                iter(chunks[:kill_after]),
                lambda p: handle_aircraft_update(p, part_tab),
                overlap=True,
            )
        assert part_tab[0x40621D].geo_position is None  # pair still open
        path = tmp_path / f"state_{batched}.json"
        state.save_state(part_tab, path)

        restored = state.load_state(path)  # "new process"
        if batched:
            resumed = BatchTracker()
            resumed.aircrafts = restored
            run_stream(iter(chunks[kill_after:]), resumed, overlap=True)
        else:
            run_stream(
                iter(chunks[kill_after:]),
                lambda p: handle_aircraft_update(p, restored),
                overlap=True,
            )
        # The odd frame paired against the RESTORED even stash.
        assert restored[0x40621D].geo_position is not None
        table_equal(full_tab, restored)
