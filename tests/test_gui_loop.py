"""Headless harness for the cv2 event loop (run_gui) — the one code path
round 4 shipped untested (round-4 verdict task #3).

A scripted fake ``cv2`` module is injected into ``sys.modules``; its
``waitKey`` delivers each tick's scripted mouse events (through the real
mouse-callback wiring, like OpenCV's event thread would) and key byte, and
``imshow`` records every window draw. ``run_gui`` then runs END-TO-END
against a real DepthSession: paint events drain through the native MPSC
ring on the solve-loop thread, the per-frame independent-ifs contract of
the reference loop (src/main.cpp:180-334) executes, and Esc tears the loop
down. Deliberate drain-loop regressions (events not drained before
handle_key, missing per-frame solve under --live, Artistic window shown
without an active effect, queue left open) fail these assertions.
"""

import sys

import numpy as np
import pytest

from realtimedepthdiffusion_tpu.config import DiffusionConfig
from realtimedepthdiffusion_tpu.live.session import DepthSession
from tests.conftest import synthetic_pair


class FakeCv2:
    """Minimal scripted cv2 stand-in: one script item per waitKey tick,
    ``{"mouse": [(event, x, y), ...], "key": int}`` (key defaults to none =
    255). When the script runs out, Esc is returned so a regressed loop
    terminates instead of hanging the suite."""

    EVENT_MOUSEMOVE = 0
    EVENT_LBUTTONDOWN = 1
    EVENT_LBUTTONUP = 4

    def __init__(self, script):
        self.script = list(script)
        self.windows = []
        self.imshows = []  # (tick, window name)
        self.mouse_cb = {}
        self.tick = 0
        self.destroyed = False

    def namedWindow(self, name):
        self.windows.append(name)

    def setMouseCallback(self, name, cb):
        self.mouse_cb[name] = cb

    def imshow(self, name, img):
        assert img is not None and img.ndim in (2, 3)
        self.imshows.append((self.tick, name))

    def waitKey(self, ms):
        assert ms == 33  # the reference's ~30 Hz UI cadence (src/main.cpp:187)
        if self.tick >= len(self.script):
            return 27
        item = self.script[self.tick]
        self.tick += 1
        cb = self.mouse_cb.get("Edited Image")
        for ev, x, y in item.get("mouse", ()):
            cb(ev, x, y, 0, None)
        return item.get("key", 255)

    def destroyAllWindows(self):
        self.destroyed = True


def _session(h=48, w=64, **cfg_kw):
    rgb, _, _ = synthetic_pair(h, w, seed=11)
    cfg = DiffusionConfig(max_iterations=20, backend="xla", **cfg_kw)
    return DepthSession(rgb, cfg)


def _drag(x0, y0, x1, y1, fake):
    """One press-drag-release gesture as mouse events."""
    evs = [(fake.EVENT_LBUTTONDOWN, x0, y0)]
    n = max(abs(x1 - x0), abs(y1 - y0), 1)
    for i in range(n + 1):
        evs.append((fake.EVENT_MOUSEMOVE,
                    x0 + (x1 - x0) * i // n, y0 + (y1 - y0) * i // n))
    evs.append((fake.EVENT_LBUTTONUP, x1, y1))
    return evs


def _run(session, script, live=False, monkeypatch=None):
    from realtimedepthdiffusion_tpu.live import gui
    from realtimedepthdiffusion_tpu.native import runtime as rt

    fake = FakeCv2(script)
    queues = []
    real_q = rt.EventQueue

    class SpyQueue(real_q):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            queues.append(self)

    monkeypatch.setitem(sys.modules, "cv2", fake)
    monkeypatch.setattr(rt, "EventQueue", SpyQueue)
    rc = gui.run_gui(session, live=live)
    return fake, queues, rc


def test_gui_loop_paint_drains_before_solve(monkeypatch):
    """A mouse drag queued during tick 0 must be DRAINED (painted into the
    session planes) before the next tick's 'd' solve — the solved depth
    pins the painted scribble. Also: 3 windows at start, no Artistic window
    without an effect, Esc exits, queue closed."""
    s = _session()
    s.set_color_key(3)  # scribble value 192
    fake = FakeCv2([])
    script = [
        {"mouse": _drag(10, 10, 30, 10, fake)},  # tick 0: paint a stroke
        {"key": ord("d")},                        # tick 1: solve
        {"key": 27},                              # tick 2: Esc (queued)
        # tick 3: Esc drains -> exit before any imshow
    ]
    fake, queues, rc = _run(s, script, monkeypatch=monkeypatch)
    assert rc == 0
    assert fake.windows == ["Original Image", "Edited Image", "Depth Image"]
    # The stroke landed in the annotation planes and the solve consumed it.
    assert s.mask_np[10, 10:31].all() or s.mask_np[10, 10:31].any()
    assert s.solve_count == 1
    d = np.asarray(s.depth0)
    yy, xx = np.nonzero(s.mask_np)
    assert np.array_equal(d[yy, xx], s.value_np[yy, xx].astype(np.float32))
    # No effect was ever active: the Artistic window never appeared.
    assert all(name != "Artistic Image" for _, name in fake.imshows)
    # Esc at tick 2 is processed at tick 3's drain: imshows stop at tick 2.
    assert max(t for t, _ in fake.imshows) == 2
    assert fake.destroyed
    assert len(queues) == 1 and queues[0]._closed


def test_gui_loop_live_cadence_and_sticky_effect(monkeypatch):
    """--live: the solve runs EVERY frame (the reference's per-frame
    contract under --live, src/main.cpp:232); a sticky effect latched by
    'b' makes the Artistic window appear exactly from that tick on and the
    artistic image re-render each frame through the fused program."""
    s = _session()
    script = [
        {},              # tick 0: live solve only
        {"key": ord("b")},  # tick 1: latch refocus (queued; applies tick 2)
        {},              # tick 2: effect active -> fused solve+effect
        {},              # tick 3: sticky re-render
        {"key": 27},
    ]
    fake, queues, rc = _run(s, script, live=True, monkeypatch=monkeypatch)
    assert rc == 0
    # Ticks 0..4 each ran handle_key with live=True -> 5 solves.
    assert s.solve_count == 5
    art_ticks = sorted(t for t, name in fake.imshows if name == "Artistic Image")
    # 'b' (returned by tick 1's waitKey) drains at tick 2: the Artistic
    # window appears at ticks 2, 3, 4 and never before.
    assert art_ticks == [2, 3, 4], art_ticks
    assert s.artistic is not None
    assert queues[0]._closed


def test_gui_loop_sticky_effect_rerenders_without_solve(monkeypatch):
    """Without --live, a latched effect re-renders every frame even with no
    key pressed (`key=='b' || refocusEffect`, src/main.cpp:190), through
    render_effect on non-solve frames."""
    s = _session()
    calls = []
    real = s.render_effect
    s.render_effect = lambda: (calls.append(1), real())[1]
    script = [
        {"key": ord("h")},  # tick 0: latch haze (applies tick 1)
        {},                 # tick 1: effect latches, renders
        {},                 # tick 2: sticky re-render
        {"key": 27},
    ]
    fake, queues, rc = _run(s, script, monkeypatch=monkeypatch)
    assert rc == 0
    assert s.solve_count == 0  # no 'd', no --live: never solved
    # handle_key renders on every frame with the effect active and no solve:
    # ticks 1, 2, 3 (the Esc-returning tick still rendered first).
    assert len(calls) == 3, calls
    art_ticks = sorted(t for t, name in fake.imshows if name == "Artistic Image")
    assert art_ticks == [1, 2, 3], art_ticks
