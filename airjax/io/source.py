"""IQ block sources: playback, synthetic stream, (stub) live SDR.

The reference's source thread sends `Vec<Complex<i16>>` blocks over an mpsc
channel (src/adsb.rs:54-89). Here a source is an iterator of (N, 2) int16
arrays; the pipeline consumes them through a background prefetch thread so
host IO overlaps device compute (the reference's thread-1/thread-2 overlap,
without unbounded queues — ours is bounded for backpressure).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Iterator, Optional

import numpy as np

from airjax.io.c16 import load_c16


def playback_blocks(
    path: str,
    chunk: int = 20000,
    realtime_factor: float | None = 2.0,
    sample_rate_hz: float = 2_000_000.0,
) -> Iterator[np.ndarray]:
    """Replay a .c16 capture in fixed chunks (src/adsb.rs:75-89).

    The reference sends 20,000-sample chunks sleeping 5 ms each (2x
    real-time) and stops while `i < len - 20000` — dropping the tail
    including the final full chunk. Pass realtime_factor=None to replay as
    fast as possible (bench mode), and chunk semantics are preserved
    exactly for parity.
    """
    data = load_c16(path)
    sleep_s = 0.0
    if realtime_factor:
        sleep_s = chunk / (sample_rate_hz * realtime_factor)
    i = 0
    while i < len(data) - chunk:
        yield data[i : i + chunk]
        i += chunk
        if sleep_s:
            time.sleep(sleep_s)


def synthetic_blocks(
    chunk: int = 20000,
    n_blocks: int | None = None,
    frames_per_block: int = 2,
    seed: int = 0,
) -> Iterator[np.ndarray]:
    """Endless (or bounded) synthetic IQ stream with embedded DF17 traffic."""
    from airjax.io import synth

    rng = np.random.default_rng(seed)
    icaos = [0x7C6B30, 0x40621D, 0xC82B10]
    b = 0
    while n_blocks is None or b < n_blocks:
        frames = []
        offsets = []
        step = max(300, chunk // max(frames_per_block, 1))
        for k in range(frames_per_block):
            icao = icaos[(b + k) % len(icaos)]
            if (b + k) % 2 == 0:
                me = synth.make_id_me("SYN" + str(100 + (b + k) % 900))
            else:
                me = synth.make_position_me(
                    tc=11,
                    altitude_ft=10000 + 25 * ((b + k) % 100),
                    cpr_lat=int(rng.integers(0, 1 << 17)),
                    cpr_lon=int(rng.integers(0, 1 << 17)),
                    odd=bool((b + k) % 2),
                )
            frames.append(synth.make_df17(icao, me))
            offsets.append(100 + k * step)
        yield synth.modulate(frames, offsets, chunk, seed=seed + b)
        b += 1


class Prefetcher:
    """Bounded background prefetch of source blocks (host<->device overlap).

    Replaces the reference's unbounded mpsc channel (src/adsb.rs:131) with a
    bounded queue: backpressure instead of unbounded memory growth.
    """

    _DONE = object()

    def __init__(self, source: Iterator[np.ndarray], depth: int = 4):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(
            target=self._run, args=(source,), daemon=True
        )
        self._error: Optional[BaseException] = None
        self._thread.start()

    def _run(self, source):
        try:
            for block in source:
                self._queue.put(block)
        except BaseException as e:  # surfaced on the consumer side
            self._error = e
        finally:
            self._queue.put(self._DONE)

    def __iter__(self):
        while True:
            item = self._queue.get()
            if item is self._DONE:
                if self._error is not None:
                    raise self._error
                return
            yield item
