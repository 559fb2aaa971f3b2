"""TC19 airborne-velocity decode (extension beyond the reference, which
classes TC19 as Unknown — src/adsb/packet.rs:36-38 — and hardwires the TUI
velocity column to "n/a", src/adsb/tui.rs:77)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from airjax.extended import assemble_extended, handle_extended_update
from airjax.io import synth
from airjax.pipeline import decode_iq_block_extended
from airjax.protocol.fields import MSG_AIRCRAFT_VELOCITY, extract_fields
from airjax.protocol.packet import (
    AdsbPacket,
    AircraftVelocityMsg,
    UnknownMsg,
)
from airjax.track.icao_cache import IcaoCache

# The standard known-answer vector (widely published; e.g. the 1090 MHz
# decoding literature): subtype 1, ground speed 159.20 kt, track 182.88 deg,
# vertical rate -832 fpm (GNSS source), GNSS 550 ft above baro.
KNOWN_HEX = "8D485020994409940838175B284F"


def test_known_vector_subtype1():
    pkt = AdsbPacket.from_hex(KNOWN_HEX, 100.0, extensions=True)
    assert pkt.msg_type == 19
    vel = pkt.msg
    assert isinstance(vel, AircraftVelocityMsg)
    assert vel.subtype == 1
    assert abs(vel.ground_speed_kt - 159.20) < 0.01
    assert abs(vel.track_deg - 182.88) < 0.01
    assert vel.vertical_rate_fpm == -832
    assert vel.vr_source_gnss
    assert vel.gnss_baro_diff_ft == 550
    assert vel.heading_deg is None and vel.airspeed_kt is None


def test_parity_mode_keeps_tc19_unknown():
    # Default (parity) decode must not diverge from the reference: TC19
    # stays an Unknown message with the raw-bytes Display form.
    pkt = AdsbPacket.from_hex(KNOWN_HEX, 100.0)
    assert isinstance(pkt.msg, UnknownMsg)
    assert "Unknown" in pkt.format()


def test_roundtrip_ground_velocity():
    for ew, ns, vr, gbd in [
        (100, -200, 1024, -75),
        (-8, -159, -832, 550),
        (0, 5, None, None),
        (-1020, 1020, 64, 25),
    ]:
        me = synth.make_velocity_me(
            ew_kt=ew, ns_kt=ns, vertical_rate_fpm=vr, gnss_baro_diff_ft=gbd
        )
        vel = AircraftVelocityMsg.from_me(me)
        assert vel.subtype == 1
        assert abs(vel.ground_speed_kt - math.hypot(ew, ns)) < 1e-9
        expect_track = math.degrees(math.atan2(ew, ns)) % 360.0
        assert abs(vel.track_deg - expect_track) < 1e-9
        assert vel.vertical_rate_fpm == vr
        assert vel.gnss_baro_diff_ft == gbd


def test_roundtrip_supersonic():
    me = synth.make_velocity_me(ew_kt=-1600, ns_kt=800, subtype=2)
    vel = AircraftVelocityMsg.from_me(me)
    assert vel.subtype == 2
    assert abs(vel.ground_speed_kt - math.hypot(1600, 800)) < 1e-9
    assert 180 < vel.track_deg < 360  # westbound


def test_roundtrip_airspeed():
    me = synth.make_velocity_me(
        subtype=3, heading_deg=221.13, airspeed_kt=320, airspeed_is_tas=True,
        vertical_rate_fpm=-256,
    )
    vel = AircraftVelocityMsg.from_me(me)
    assert vel.ground_speed_kt is None and vel.track_deg is None
    assert abs(vel.heading_deg - 221.13) < 360 / 1024
    assert vel.airspeed_kt == 320 and vel.airspeed_is_tas
    assert vel.vertical_rate_fpm == -256

    # Heading unavailable encodes as status bit 0.
    me2 = synth.make_velocity_me(subtype=3, heading_deg=None, airspeed_kt=100)
    vel2 = AircraftVelocityMsg.from_me(me2)
    assert vel2.heading_deg is None and vel2.airspeed_kt == 100


def test_no_data_encodings():
    # val == 0 in either component means "no data" -> no speed/track.
    me = bytearray(synth.make_velocity_me(ew_kt=10, ns_kt=10))
    me[1] &= ~0x3
    me[2] = 0  # zero the E-W value field
    vel = AircraftVelocityMsg.from_me(bytes(me))
    assert vel.ground_speed_kt is None and vel.track_deg is None


def test_batched_fields_match_scalar():
    rng = np.random.default_rng(7)
    frames = []
    for _ in range(32):
        ew = int(rng.integers(-1022, 1023))
        ns = int(rng.integers(-1022, 1023))
        vr = int(rng.integers(-511, 511)) * 64
        me = synth.make_velocity_me(ew_kt=ew, ns_kt=ns, vertical_rate_fpm=vr)
        frames.append(synth.make_df17(0x4840D6, me))
    arr = np.frombuffer(b"".join(frames), np.uint8).reshape(-1, 14)
    f = jax.device_get(extract_fields(jnp.asarray(arr)))
    for i, frame in enumerate(frames):
        vel = AircraftVelocityMsg.from_me(frame[4:11])
        assert int(f["msg_class_ext"][i]) == MSG_AIRCRAFT_VELOCITY
        assert int(f["vel_subtype"][i]) == vel.subtype
        vx = (int(f["vel_val_a"][i]) - 1) * (-1 if int(f["vel_sign_a"][i]) else 1)
        vy = (int(f["vel_val_b"][i]) - 1) * (-1 if int(f["vel_sign_b"][i]) else 1)
        assert abs(math.hypot(vx, vy) - vel.ground_speed_kt) < 1e-9
        vr_val = int(f["vel_vr_val"][i])
        vr_dec = (vr_val - 1) * 64 * (-1 if int(f["vel_vr_sign"][i]) else 1)
        assert vr_dec == vel.vertical_rate_fpm


def test_e2e_extended_pipeline_and_tracker():
    icao = 0x4840D6
    me = synth.make_velocity_me(ew_kt=-8, ns_kt=-159, vertical_rate_fpm=-832)
    frame = synth.make_df17(icao, me)
    iq = synth.modulate([frame], [700], 4000, seed=3)
    n_off = len(iq) - 240
    out = jax.device_get(decode_iq_block_extended(jnp.asarray(iq), n_off, 64))
    pkts = [p for _, p in assemble_extended(out, 100.0, IcaoCache())]
    vels = [
        p for p in pkts
        if isinstance(p, AdsbPacket) and isinstance(p.msg, AircraftVelocityMsg)
    ]
    assert vels, "velocity frame not decoded by extended pipeline"

    aircrafts = {}
    handle_extended_update(vels[0], aircrafts)
    plane = aircrafts[icao]
    assert abs(plane.ground_speed_kt - math.hypot(8, 159)) < 1e-6
    assert plane.vertical_rate_fpm == -832
    summary = plane.get_summary().to_json(extended=True)
    assert abs(summary["groundSpeedKt"] - plane.ground_speed_kt) < 1e-9
    assert summary["verticalRateFpm"] == -832
    # Parity-schema JSON must stay reference-exact (no extra keys).
    assert set(plane.get_summary().to_json()) == {
        "icao", "callsign", "altitude", "geoPosition", "lastContact",
    }


def test_web_display_extended_schema():
    from airjax.ui.web import WebDisplay

    me = synth.make_velocity_me(ew_kt=30, ns_kt=40, vertical_rate_fpm=640)
    pkt = AdsbPacket.from_bytes(synth.make_df17(0x123456, me), 100.0, extensions=True)
    ext = WebDisplay(port=0, quiet=True, extended_schema=True)
    ext.on_packet(pkt)
    (summary,) = ext.snapshot()
    assert summary["groundSpeedKt"] == 50.0
    assert summary["verticalRateFpm"] == 640

    plain = WebDisplay(port=0, quiet=True)
    plain.on_packet(pkt)
    (s2,) = plain.snapshot()
    assert set(s2) == {"icao", "callsign", "altitude", "geoPosition", "lastContact"}
