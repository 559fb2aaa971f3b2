"""IcaoCache unit tests: acceptance-window semantics + the amortized
expiry sweep (VERDICT r4 item 8 — stale never-requeried entries must not
accumulate in a long live run)."""

from airjax.track.icao_cache import IcaoCache


def test_basic_window():
    c = IcaoCache(max_age_s=60.0)
    c.add(0xABC123, now=100.0)
    assert c.contains(0xABC123, now=100.0)
    assert c.contains(0xABC123, now=159.9)
    assert not c.contains(0xABC123, now=160.1)
    # The failed query pruned it.
    assert len(c) == 0


def test_add_many_matches_repeated_add():
    a, b = IcaoCache(), IcaoCache()
    icaos = [0x100 + i for i in range(10)]
    for i in icaos:
        a.add(i, now=5.0)
    b.add_many(icaos, now=5.0)
    assert a._seen == b._seen


def test_sweep_drops_expired_unqueried_entries():
    """Entries whose aircraft left and are never probed again must be
    swept out by ordinary add() traffic alone (no contains() calls)."""
    c = IcaoCache(max_age_s=60.0)
    stale = [0x10000 + i for i in range(100)]
    c.add_many(stale, now=0.0)
    # Fresh traffic long after the stale cohort expired: the size-doubling
    # sweep trigger must fire well before 10x the stale population.
    for i in range(1000):
        c.add(0x20000 + i, now=1000.0 + i * 1e-3)
    assert all(s not in c._seen for s in stale), len(c)
    # Fresh entries survive.
    assert 0x20000 in c._seen and len(c) == 1000


def test_sweep_keeps_fresh_entries_exact():
    c = IcaoCache(max_age_s=60.0)
    c.add_many(range(200), now=0.0)  # force past the sweep floor
    c.add(9999, now=30.0)  # within window: sweep may fire, keeps all
    assert len(c) == 201
    assert c.contains(5, now=59.0)


def test_sweep_is_amortized_not_per_add():
    """The sweep must not rescan the dict on every add: adding N fresh
    entries performs O(N) total work (size-doubling trigger)."""
    c = IcaoCache(max_age_s=60.0)
    sweeps = 0
    orig = c._maybe_sweep

    def counting(now):
        nonlocal sweeps
        if len(c._seen) >= c._next_sweep_size:
            sweeps += 1
        orig(now)

    c._maybe_sweep = counting
    for i in range(10_000):
        c.add(i, now=float(i) * 1e-6)
    assert sweeps <= 16, sweeps
