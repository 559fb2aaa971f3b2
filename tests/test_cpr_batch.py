"""Vectorized CPR (mass-replay analytics) vs the scalar reference-parity
decoder, fuzzed element-wise."""

import numpy as np

from airjax.protocol.packet import CprFormat
from airjax.track.cpr import (
    calc_num_zones,
    calculate_geographic_position,
)
from airjax.track.cpr_batch import calc_num_zones_batch, decode_pairs


def test_nl_batch_matches_scalar():
    lats = np.concatenate(
        [
            np.linspace(-89.9, 89.9, 2001),
            [0.0, 87.0, -87.0, 87.1, -87.1, 90.0, -90.0, 10.4704713],
        ]
    )
    batch = calc_num_zones_batch(lats)
    for lat, nl in zip(lats, batch):
        assert nl == calc_num_zones(float(lat)), lat


def test_decode_pairs_matches_scalar_fuzz():
    rng = np.random.default_rng(0)
    n = 2000
    even_lat = rng.integers(0, 1 << 17, n)
    even_lon = rng.integers(0, 1 << 17, n)
    odd_lat = rng.integers(0, 1 << 17, n)
    odd_lon = rng.integers(0, 1 << 17, n)
    newest_odd = rng.random(n) < 0.5

    lat_b, lon_b, valid_b = decode_pairs(
        even_lat, even_lon, odd_lat, odd_lon, newest_odd
    )
    n_valid = 0
    for i in range(n):
        first = CprFormat.EVEN if newest_odd[i] else CprFormat.ODD
        geo = calculate_geographic_position(
            (int(even_lat[i]), int(even_lon[i])),
            (int(odd_lat[i]), int(odd_lon[i])),
            first,
        )
        assert (geo is not None) == bool(valid_b[i]), i
        if geo is not None:
            n_valid += 1
            assert abs(geo.latitude - lat_b[i]) < 1e-12, i
            assert abs(geo.longitude - lon_b[i]) < 1e-12, i
    assert n_valid > 100  # the fuzz actually exercises the decode path


def test_decode_pairs_textbook_vector():
    # The reference's own textbook pair (src/adsb/aircraft.rs:202-212):
    # even (93000, 51372), odd (74158, 50194), first=ODD (newest is even).
    lat, lon, valid = decode_pairs(
        np.array([93000]), np.array([51372]),
        np.array([74158]), np.array([50194]),
        np.array([False]),
    )
    assert valid[0]
    assert abs(lat[0] - 52.25720) < 1e-4
    # Matching the reference CODE (3.91937), not its inconsistent test
    # constant (3.8295) — see tests/test_cpr.py.
    assert abs(lon[0] - 3.91937) < 1e-4
