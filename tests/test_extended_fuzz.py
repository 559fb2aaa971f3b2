"""Randomized three-way extended-mode parity (VERDICT r1 item 6).

Runs tools/fuzz_extended.py's differential loop at CI scale (the tool's
default is 320+ iterations; full runs are part of the perf/parity report).
Every iteration: jitted device pipeline == golden scalar oracle == native
C++ decoder on a random mixed-DF capture (DF0/4/5/11+IC/16/17/18/20/21,
bit flips, low SNR, chunk-edge straddles, tie/constant storms).
"""

import importlib.util
import pathlib
import sys

TOOLS = pathlib.Path(__file__).parent.parent / "tools"


def _load_fuzzer():
    spec = importlib.util.spec_from_file_location(
        "fuzz_extended", TOOLS / "fuzz_extended.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["fuzz_extended"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_extended_three_way_fuzz():
    fuzz = _load_fuzzer()
    assert fuzz.run(iters=60, seed=1234, chunk=4000) == 0


def test_extended_three_way_fuzz_recover2():
    """The opt-in 2-bit-recovery mode holds the same three-way contract:
    device == golden == native, with unique-2-flip repairs classified
    'long2' (pre-gate) identically by all tiers."""
    fuzz = _load_fuzzer()
    assert fuzz.run(iters=25, seed=77, chunk=4000, recover2=True) == 0
