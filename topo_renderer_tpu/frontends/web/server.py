"""Web frontend: browser UI over server-side TPU rendering.

Counterpart of `topo-renderer-web` (`topo-renderer-web/src/lib.rs:21-140`,
`index.html:228-330`) — reinterpreted for TPU: instead of wasm+WebGPU in the
browser, the browser posts viewpoints and the server renders frames on the
TPU. Feature parity:
  * ``set_location(latitude, longitude)`` — the form posts the same fields
    the reference's JS form does (`index.html:299-314`);
  * status line driven by background-task notifications
    (`lib.rs:111-119`);
  * toast-style error reporting for failed tiles (`lib.rs:94-104`).

Endpoints:
  GET  /                 — UI page
  GET  /render?latitude=..&longitude=..&width=..&height=..&panorama=1&fog=..
                         — rendered PNG (triggers tile streaming on demand)
  GET  /status           — JSON task counters
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

from topo_renderer_tpu.app.application import Application
from topo_renderer_tpu.config import Settings
from topo_renderer_tpu.geo import GeoCoord
from topo_renderer_tpu.ops.panorama import PanoramaSpec
from topo_renderer_tpu.utils.imageio import encode_png

INDEX_HTML = (Path(__file__).parent / "index.html").read_text(encoding="utf-8")


class WebFrontend:
    def __init__(self, settings: Settings | None = None, port: int = 8080):
        self.app = Application(settings)
        self._lock = threading.Lock()
        # One render at a time: the engine + application state are shared
        # across ThreadingHTTPServer handler threads.
        self._render_lock = threading.Lock()
        self._status = {"running": 0, "errors": [], "loaded": 0}
        self._notes = self.app.subscribe_to_background_notifications()
        threading.Thread(target=self._watch_notifications, daemon=True).start()
        frontend = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            def _send(self, code, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                url = urlparse(self.path)
                q = parse_qs(url.query)
                if url.path == "/":
                    self._send(200, INDEX_HTML.encode(), "text/html; charset=utf-8")
                elif url.path == "/status":
                    with frontend._lock:
                        body = json.dumps(frontend._status).encode()
                    self._send(200, body, "application/json")
                elif url.path == "/render":
                    try:
                        png = frontend.render(q)
                        self._send(200, png, "image/png")
                    except Exception as e:
                        self._send(500, str(e).encode(), "text/plain")
                else:
                    self._send(404, b"not found", "text/plain")

        self._httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)

    def _watch_notifications(self):
        while True:
            note = self._notes.get()
            with self._lock:
                self._status["running"] = note.running
                if note.kind == "task_errored":
                    self._status["errors"] = (self._status["errors"] + [note.error])[-5:]

    # ---- rendering -------------------------------------------------------

    def render(self, q: dict) -> bytes:
        lat = float(q.get("latitude", ["49.35135"])[0])
        lon = float(q.get("longitude", ["20.21139"])[0])
        width = int(q.get("width", ["1024"])[0])
        height = int(q.get("height", ["384"])[0])
        panorama = q.get("panorama", ["1"])[0] == "1"
        fog = q.get("fog", [None])[0] or None

        location = GeoCoord(lat, lon)
        with self._render_lock:
            # set_location semantics (`lib.rs:26-36`): stream tiles + reset
            # camera.
            self.app.change_location(location)
            self.app.wait_for_terrain()
            t0 = time.time()
            while time.time() - t0 < 1.0:
                self.app.pump_events()
                time.sleep(0.05)
            with self._lock:
                self._status["loaded"] = len(self.app.engine.loaded_locations)

            cam = self.app.data.camera
            if panorama:
                spec = PanoramaSpec.fast(width=width, height=height)
                res = self.app.engine.render_panorama(cam, spec, fog=fog)
            else:
                res = self.app.engine.render(cam, width, height, fast=True)
            return encode_png(res.color)

    def serve_forever(self):
        self._httpd.serve_forever()


def main():
    import argparse

    p = argparse.ArgumentParser(description="topo-renderer-tpu web frontend")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--settings", default=None)
    args = p.parse_args()
    settings = Settings.load(path=args.settings)
    WebFrontend(settings, port=args.port).serve_forever()


if __name__ == "__main__":
    main()
