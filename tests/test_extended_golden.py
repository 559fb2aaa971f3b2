"""Differential test: device extended classification vs the scalar oracle
(airjax.golden.decode_chunk_extended) on mixed-format noisy captures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airjax import golden
from airjax.io import synth
from airjax.pipeline import decode_iq_block_extended
from airjax.protocol import shortframe

ICAO = 0x7C6B30


def _device_classified(iq):
    n_off = len(iq) - 240
    out = jax.device_get(decode_iq_block_extended(jnp.asarray(iq), n_off, 256))
    hits = []
    for k in range(len(out["offsets"])):
        off = int(out["offsets"][k])
        if not out["valid"][k]:
            continue
        if out["good_long"][k]:
            hits.append((off, "long", out["frames"][k].tobytes(), 0))
        elif out["good_df11"][k]:
            hits.append((off, "df11", out["frames_raw"][k].tobytes()[:7], 0))
        elif out["cand_df11_ic"][k]:
            hits.append(
                (off, "df11_ic", out["frames_raw"][k].tobytes()[:7], int(out["icao_ap_short"][k]))
            )
        elif out["cand_short_ap"][k]:
            hits.append(
                (off, "short_ap", out["frames_raw"][k].tobytes()[:7], int(out["icao_ap_short"][k]))
            )
        elif out["cand_long_ap"][k]:
            hits.append(
                (off, "long_ap", out["frames_raw"][k].tobytes(), int(out["icao_ap_long"][k]))
            )
    return hits


@pytest.mark.parametrize("seed,snr", [(0, 20.0), (1, 8.0), (2, 4.0)])
def test_extended_matches_scalar_oracle(seed, snr):
    frames = [
        shortframe.make_df11(ICAO),
        synth.make_df17(ICAO, synth.make_id_me("GOLDEXT")),
        shortframe.make_df4(ICAO, 9000),
        shortframe.make_df5(ICAO, 3310),
        shortframe.make_df20(ICAO, 31000),
        shortframe.make_df21(ICAO, 7001),
    ]
    offsets = [300, 1200, 2200, 3000, 3800, 4800]
    iq = synth.modulate(frames, offsets, 6500, snr_db=snr, seed=seed)
    ours = _device_classified(iq)
    gold = golden.decode_chunk_extended(iq)
    assert ours == gold


def test_extended_oracle_pure_noise():
    rng = np.random.default_rng(3)
    iq = np.clip(np.round(rng.normal(0, 150, (4000, 2))), -32768, 32767).astype(np.int16)
    assert _device_classified(iq) == golden.decode_chunk_extended(iq)
