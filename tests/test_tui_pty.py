"""Drive the curses TUI through a real pty: decode a TC19 velocity frame
in extended mode and assert the velocity column renders (the reference
hardwires it to "n/a", src/adsb/tui.rs:77)."""

import os
import pty
import select
import time


def test_tui_renders_velocity_column():
    pid, fd = pty.fork()
    if pid == 0:  # child: run the TUI on a synthetic extended stream
        status = 1
        try:
            os.environ["TERM"] = "xterm"
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
            threading.Thread(
                target=run_stream,
                args=(iter([iq]), app.on_packet),
                kwargs={"extended": True},
                daemon=True,
            ).start()
            interactive_display(app)
            status = 0
        except BaseException:
            pass
        finally:
            os._exit(status)

    # Parent: read frames until the velocity cell appears, then quit.
    deadline = time.time() + 90
    buf = b""
    saw_velocity = False
    try:
        while time.time() < deadline:
            r, _, _ = select.select([fd], [], [], 1.0)
            if r:
                try:
                    chunk = os.read(fd, 65536)
                except OSError:
                    break
                if not chunk:
                    break
                buf += chunk
            if b"159 kt" in buf and b"TUIVEL" in buf:
                saw_velocity = True
                break
        os.write(fd, b"q")
        # Drain until child exits.
        t0 = time.time()
        while time.time() - t0 < 10:
            r, _, _ = select.select([fd], [], [], 0.5)
            if not r:
                continue
            try:
                if not os.read(fd, 65536):
                    break
            except OSError:
                break
    finally:
        _, status = os.waitpid(pid, 0)
        os.close(fd)
    assert saw_velocity, buf[-2000:]
    assert os.waitstatus_to_exitcode(status) == 0
