"""OpenCV HighGUI front-end — the reference's window/mouse/key contract
(src/main.cpp:175-334) driving the device-resident session.

Windows: "Original Image", "Edited Image" (paint target), "Depth Image",
plus "Artistic Image" once an effect is active. Mouse-drag paints on the
Edited Image; keys are documented in live/session.py. The UI ticks at
waitKey(33) ~= 30 Hz like the reference (src/main.cpp:187).

OpenCV appears here only as a display/event surface (BASELINE.json: imaging
libs confined to the I/O boundary); all compute is the session's compiled
device programs. Display arrays are converted RGB->BGR at the boundary.
"""

from __future__ import annotations

from .session import DepthSession


def handle_key(session: DepthSession, key: int, live: bool = False) -> bool:
    """Apply one key event (the reference's key contract,
    src/main.cpp:180-334) to the session; returns True when the loop should
    exit (Esc). Pure session logic — extracted from the cv2 loop so the
    state machine is unit-testable without a display.

    Returns True to quit. ``key`` is the raw waitKey byte (-1/255 = none).
    """
    if key == 27:  # Esc
        return True
    ch = chr(key) if 32 <= key < 127 else ""

    if ch.isdigit():
        session.set_color_key(int(ch))
    elif ch and ch in "bBgGhH":
        session.set_effect_key(ch)
        session.render_effect()
    elif (ch and ch in "dD") or live:
        # solve() already renders the active effect through the fused
        # solve+effect program; no second render needed.
        session.solve()
    elif ch and ch in "sS":
        session.save(".")
        print("Saving images...")
    elif ch and ch in "tT":
        print(session.timing_report())
    elif ch == "-":
        session.adjust_radius(-2)
        print(f"Scribble Radius: {session.scribble_radius}")
    elif ch == "+":
        session.adjust_radius(+2)
        print(f"Scribble Radius: {session.scribble_radius}")
    return False


def run_gui(session: DepthSession, live: bool = False) -> int:
    import cv2  # I/O boundary import

    from ..native.runtime import EventQueue

    # OpenCV fires mouse callbacks on its own thread; events go through the
    # native MPSC ring buffer and are drained on the solve-loop thread (the
    # reference mutates shared GPU state directly from the callback,
    # src/main.cpp:46-62 — a cross-thread hazard this design removes).
    events = EventQueue(capacity=4096)
    state = {"pressed": False}

    def on_mouse(event, x, y, flags, _userdata):
        if event == cv2.EVENT_LBUTTONDOWN:
            state["pressed"] = True
        elif event == cv2.EVENT_LBUTTONUP:
            state["pressed"] = False
        if event == cv2.EVENT_MOUSEMOVE and state["pressed"]:
            events.push(EventQueue.KIND_PAINT, x, y, 0)

    def bgr(rgb):
        return rgb[..., ::-1]

    cv2.namedWindow("Original Image")
    cv2.namedWindow("Edited Image")
    cv2.namedWindow("Depth Image")
    cv2.setMouseCallback("Edited Image", on_mouse)

    while True:
        while (ev := events.pop()) is not None:
            if ev[0] == EventQueue.KIND_PAINT:
                session.paint(ev[1], ev[2])

        cv2.imshow("Original Image", bgr(session.rgb_np))
        cv2.imshow("Edited Image", bgr(session.edited_image()))
        cv2.imshow("Depth Image", session.depth_image())
        if session.effect and session.artistic is not None:
            import numpy as np

            cv2.imshow("Artistic Image", bgr(np.asarray(session.artistic)))

        key = cv2.waitKey(33) & 0xFF
        if handle_key(session, key, live):
            break

    events.close()
    cv2.destroyAllWindows()
    return 0
