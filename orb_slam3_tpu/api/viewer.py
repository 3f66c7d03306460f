"""Live viewer: online observability for a headless TPU session.

Role of the Pangolin viewer thread (`/root/reference/src/Viewer.cc:162`,
`MapDrawer.cc:135-447`, `FrameDrawer.cc:370`) re-imagined for hardware with
no display attached: a lightweight HTTP server (stdlib, zero dependencies)
renders the live Atlas and tracking state into an auto-refreshing page —
top-down map view (landmarks, keyframes, trajectory), the current frame
with tracked keypoints, and the run counters. Because the map state is an
immutable pytree snapshot, the viewer thread reads it without any locking
against tracking/mapping (SURVEY.md §7.1).

The reference viewer's interactive controls map to HTTP commands:
localization-mode toggle (`menuLocalizationMode`, Viewer.cc:253-262) and
session reset (`menuReset`) via `/cmd?...`.

Usage:
    viewer = LiveViewer(system, port=8090)
    viewer.start()                 # http://localhost:8090
    ... run frames ...
    viewer.stop()
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>orb_slam3_tpu live viewer</title>
<meta http-equiv="refresh" content="{refresh}">
<style>
 body {{ background:#111; color:#ddd; font-family:monospace; }}
 img {{ border:1px solid #444; margin:4px; }}
 a {{ color:#7ab4ff; }}
</style></head>
<body>
<h3>orb_slam3_tpu — live session</h3>
<div id="stats">{stats}</div>
<img src="/map.png" width="540"> <img src="/frame.png" width="540">
<p><a href="/map3d" target="_blank">interactive 3D map</a></p>
<p><a href="/cmd?localization=1">localization mode ON</a> |
   <a href="/cmd?localization=0">OFF</a> |
   <a href="/cmd?reset=1">reset session</a></p>
</body></html>"""


class LiveViewer:
    def __init__(self, system, port: int = 8090, refresh_s: float = 1.0):
        self.system = system
        self.port = port
        self.refresh_s = refresh_s
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------------
    def _stats(self) -> dict:
        t = self.system.tracker
        s = t.map
        lc = t.loop_closer
        return {
            "state": ["NOT_INITIALIZED", "OK", "RECENTLY_LOST", "LOST"][
                min(int(t.state), 3)
            ],
            "n_keyframes": int(np.asarray(s.n_kf)),
            "n_landmarks": int(np.asarray(s.n_lm)),
            "n_maps": int(np.asarray(s.n_maps)),
            "active_map": int(np.asarray(s.active_map)),
            "inliers": int(t.last_inliers),
            "frames": len(t.trajectory),
            "loops": lc.n_loops if lc else 0,
            "merges": lc.n_merges if lc else 0,
            "localization_mode": bool(t.mapping_paused),
        }

    def _render_map_png(self) -> bytes:
        from . import viz
        import tempfile, os

        with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
            path = f.name
        try:
            traj = None
            viz.save_topdown_png(path, self.system.tracker.map, traj)
            with open(path, "rb") as f:
                return f.read()
        finally:
            os.unlink(path)

    def _render_frame_png(self) -> bytes:
        import cv2

        t = self.system.tracker
        img = getattr(self.system, "_last_img", None)
        if img is None:
            img = np.zeros((240, 320), np.float32)
        img8 = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
        canvas = cv2.cvtColor(img8, cv2.COLOR_GRAY2BGR)
        if t.last is not None:
            feats = t.last["feats"]
            xy = np.asarray(feats.xy)
            valid = np.asarray(feats.valid)
            tracked = (np.asarray(t._last_feat_lm) >= 0
                       if getattr(t, "_last_feat_lm", None) is not None
                       else np.zeros(len(xy), bool))
            for p, v, m in zip(xy.astype(int), valid, tracked):
                if not v:
                    continue
                color = (80, 220, 80) if m else (60, 60, 200)
                cv2.circle(canvas, tuple(p), 2, color, -1)
        ok, buf = cv2.imencode(".png", canvas)
        return buf.tobytes() if ok else b""

    # ------------------------------------------------------------------
    def start(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silent
                pass

            def _send(self, code, ctype, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                try:
                    u = urlparse(self.path)
                    if u.path == "/":
                        stats = viewer._stats()
                        rows = " ".join(
                            f"{k}=<b>{v}</b>" for k, v in stats.items()
                        )
                        page = _PAGE.format(
                            refresh=viewer.refresh_s, stats=rows
                        )
                        self._send(200, "text/html", page.encode())
                    elif u.path == "/stats.json":
                        self._send(200, "application/json",
                                   json.dumps(viewer._stats()).encode())
                    elif u.path == "/map.png":
                        self._send(200, "image/png",
                                   viewer._render_map_png())
                    elif u.path == "/map3d":
                        from . import viz

                        t = viewer.system.tracker
                        html = viz.render_map_html(t.map)
                        self._send(200, "text/html", html.encode())
                    elif u.path == "/frame.png":
                        self._send(200, "image/png",
                                   viewer._render_frame_png())
                    elif u.path == "/cmd":
                        q = parse_qs(u.query)
                        if q.get("localization", ["0"])[0] == "1":
                            viewer.system.activate_localization_mode()
                        elif "localization" in q:
                            viewer.system.deactivate_localization_mode()
                        if q.get("reset", ["0"])[0] == "1":
                            viewer.system.reset()
                        self._send(200, "text/plain", b"ok")
                    else:
                        self._send(404, "text/plain", b"not found")
                except Exception as e:  # noqa: BLE001 — viewer never kills the run
                    try:
                        self._send(500, "text/plain", str(e).encode())
                    except Exception:
                        pass

        self._server = ThreadingHTTPServer(("127.0.0.1", self.port), Handler)
        self.port = self._server.server_port  # resolves port=0
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="viewer", daemon=True
        )
        self._thread.start()

    def stop(self):
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
