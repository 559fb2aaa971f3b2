"""DF20/21 (112-bit Comm-B, AP-addressed) extended decode tests."""

import numpy as np

from airjax.io import synth
from airjax.protocol import shortframe
from airjax.protocol.crc import crc24
from airjax.protocol.packet import SurveillanceReply
from airjax.runner import run_stream

ICAO = 0x40621D
DF20 = shortframe.make_df20(ICAO, altitude_ft=35000, mb=b"COMMB20")
DF21 = shortframe.make_df21(ICAO, squawk=4601, mb=b"COMMB21")
DF11 = shortframe.make_df11(ICAO)


def test_builders():
    assert len(DF20) == 14 and len(DF21) == 14
    assert crc24(DF20[:11]) ^ int.from_bytes(DF20[11:], "big") == ICAO
    assert crc24(DF21[:11]) ^ int.from_bytes(DF21[11:], "big") == ICAO
    assert DF20[0] >> 3 == 20 and DF21[0] >> 3 == 21


def test_commb_stream_decoding():
    iq = synth.modulate([DF11, DF20, DF21], [300, 2000, 4000], 8000, seed=9)
    got = []
    run_stream(iter([iq]), got.append, overlap=False, extended=True)
    replies = [p for p in got if isinstance(p, SurveillanceReply)]
    assert {r.df for r in replies} == {20, 21}
    assert any(r.df == 20 and r.altitude_ft == 35000 and r.icao == ICAO for r in replies)
    assert any(r.df == 21 and r.squawk == 4601 and r.icao == ICAO for r in replies)


def test_commb_rejected_without_known_icao():
    iq = synth.modulate([DF20], [500], 4000, seed=10)
    got = []
    run_stream(iter([iq]), got.append, overlap=False, extended=True)
    assert not [p for p in got if isinstance(p, SurveillanceReply)]
