"""Drive the curses TUI through a real pty: decode a TC19 velocity frame
in extended mode and assert the velocity column renders (the reference
hardwires it to "n/a", src/adsb/tui.rs:77).

Runs a FRESH interpreter on the pty (not pty.fork of the test process:
forking a pytest process that already spawned threads — prefetchers, web
servers from earlier tests — deadlocks in the child)."""

import os
import pathlib
import pty
import select
import subprocess
import sys
import time

_CHILD = r"""
import os
os.environ["TERM"] = "xterm"
import jax
jax.config.update("jax_platforms", "cpu")
import threading
from airjax.io import synth
from airjax.runner import run_stream
from airjax.ui.tui import TuiApp, interactive_display

me = synth.make_velocity_me(ew_kt=-8, ns_kt=-159, vertical_rate_fpm=-832)
frames = [
    synth.make_df17(0x4840D6, synth.make_id_me("TUIVEL")),
    synth.make_df17(0x4840D6, me),
]
iq = synth.modulate(frames, [500, 1500], 20000, seed=3)
app = TuiApp()
sink = (
    app.batched_sink(extended=True)
    if os.environ.get("AIRJAX_TEST_BATCHED")
    else app.on_packet
)
threading.Thread(
    target=run_stream,
    args=(iter([iq]), sink),
    kwargs={"extended": True},
    daemon=True,
).start()
interactive_display(app)
"""

import pytest


@pytest.mark.parametrize("batched", [False, True])
def test_tui_renders_velocity_column(batched):
    parent_fd, child_fd = pty.openpty()
    env = dict(os.environ, PYTHONPATH=str(pathlib.Path(__file__).resolve().parent.parent))
    if batched:
        env["AIRJAX_TEST_BATCHED"] = "1"
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD],
        stdin=child_fd,
        stdout=child_fd,
        stderr=subprocess.PIPE,
        env=env,
        close_fds=True,
    )
    os.close(child_fd)

    deadline = time.time() + 120
    buf = b""
    saw_velocity = False
    try:
        while time.time() < deadline:
            r, _, _ = select.select([parent_fd], [], [], 1.0)
            if r:
                try:
                    chunk = os.read(parent_fd, 65536)
                except OSError:
                    break
                if not chunk:
                    break
                buf += chunk
            if b"159 kt" in buf and b"TUIVEL" in buf:
                saw_velocity = True
                break
        os.write(parent_fd, b"q")
        try:
            _, err = proc.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
            _, err = proc.communicate()
    finally:
        os.close(parent_fd)
    assert saw_velocity, (buf[-2000:], err[-2000:] if err else b"")
    assert proc.returncode == 0, err[-2000:] if err else b""


_CHILD_SHARDED = r"""
import os
os.environ["TERM"] = "xterm"
import jax
jax.config.update("jax_platforms", "cpu")
import threading
from airjax.io import synth
from airjax.runner import run_stream_sharded
from airjax.parallel.mesh import make_mesh
from airjax.ui.tui import TuiApp, interactive_display

frames = [synth.make_df17(0x4840D6, synth.make_id_me("TUISHRD"))] * 2
iq = synth.modulate(frames, [500, 1500], 20000, seed=3)
app = TuiApp()
threading.Thread(
    target=run_stream_sharded,
    args=(iter([iq]), app.on_packet),
    kwargs={"mesh": make_mesh(2)},
    daemon=True,
).start()
interactive_display(app)
"""


def test_tui_renders_with_sharded_runner():
    """`adsb -m interactive --devices N` composition: the curses table
    fills from the mesh-sharded stream runner."""
    parent_fd, child_fd = pty.openpty()
    env = dict(
        os.environ,
        PYTHONPATH=str(pathlib.Path(__file__).resolve().parent.parent),
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD_SHARDED],
        stdin=child_fd,
        stdout=child_fd,
        stderr=subprocess.PIPE,
        env=env,
        close_fds=True,
    )
    os.close(child_fd)
    deadline = time.time() + 120
    buf = b""
    saw = False
    try:
        while time.time() < deadline:
            r, _, _ = select.select([parent_fd], [], [], 1.0)
            if r:
                try:
                    chunk = os.read(parent_fd, 65536)
                except OSError:
                    break
                if not chunk:
                    break
                buf += chunk
            if b"TUISHRD" in buf and b"4840d6" in buf.lower():
                saw = True
                break
        os.write(parent_fd, b"q")
        try:
            _, err = proc.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
            _, err = proc.communicate()
    finally:
        os.close(parent_fd)
    assert saw, (buf[-2000:], err[-2000:] if err else b"")
    assert proc.returncode == 0, err[-2000:] if err else b""
