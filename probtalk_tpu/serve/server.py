"""Minimal production HTTP front-end over :class:`ServingEngine`.

Stdlib-only (``http.server``): POST audio-feature chunks per session, a
single pump thread micro-batches every ready session into one device call
(the engine's bucketed compiled step). Binary payloads are raw
little-endian float32; shapes ride in headers — no JSON tensor encoding
on the hot path.

API:
  POST /v1/sessions                 {"speaker": int, "seed": int} -> {"id": sid}
  POST /v1/sessions/<id>/feed       body = float32 (T, aud_dim) raw bytes,
                                    header X-Shape: "T,aud_dim"; raw-audio
                                    engines take a (S,) 16 kHz waveform
                                    (X-Shape: "S"), float32 or PCM int16
                                    (X-Dtype: int16)
                                    -> float32 (T_ready, C) + X-Shape header
  POST /v1/sessions/<id>/flush      -> remaining float32 frames + X-Shape
  GET  /healthz                     -> {"ok": true, "sessions": n}

The reference has no serving layer at all (its closest analogue is the
one-shot ``scripts/demo.py``); this subsystem is TPU-deployment-specific.
"""

from __future__ import annotations

import json
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from probtalk_tpu.serve.engine import EngineBusy, ServingEngine, SessionClosed

# consecutive pump failures before /healthz reports the server unhealthy
_UNHEALTHY_AFTER = 5


class MotionServer:
    """Owns the engine, the HTTP server, and the pump thread."""

    def __init__(self, engine: ServingEngine, host: str = "127.0.0.1",
                 port: int = 0, pump_interval: float = 0.01):
        self.engine = engine
        self.pump_interval = pump_interval
        self._stop = threading.Event()
        self.pump_errors = 0
        # consecutive failures: drives pump backoff and flips /healthz
        # ok:false past _UNHEALTHY_AFTER so load balancers stop routing to
        # a server that can no longer produce frames
        self.pump_errors_consecutive = 0
        handler = _make_handler(self)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self.httpd.server_address[1]
        self._threads = []

    def start(self):
        t1 = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t2 = threading.Thread(target=self._pump_loop, daemon=True)
        t1.start()
        t2.start()
        self._threads = [t1, t2]
        return self

    def stop(self):
        self._stop.set()
        self.httpd.shutdown()
        self.httpd.server_close()

    def _pump_loop(self):
        # the pump thread must survive ANY per-round failure: if it died,
        # the server would keep accepting requests but never produce
        # frames again (zombie). Errors are counted and surfaced on
        # /healthz; a PERSISTENTLY failing engine (lost device, poisoned
        # step) backs off exponentially instead of burning the 100 Hz loop
        # on tracebacks, and flips /healthz ok:false so traffic drains.
        delay = self.pump_interval
        while not self._stop.wait(delay):
            try:
                self.engine.pump_all()
                self.pump_errors_consecutive = 0
                delay = self.pump_interval
            except Exception:
                self.pump_errors += 1
                self.pump_errors_consecutive += 1
                if self.pump_errors_consecutive <= 3:
                    traceback.print_exc()   # first few get full tracebacks
                delay = min(max(delay, self.pump_interval) * 2, 5.0)


def _make_handler(server: MotionServer):
    engine = server.engine

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):   # quiet
            pass

        # ---- helpers -------------------------------------------------
        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _frames(self, arr: np.ndarray):
            body = np.ascontiguousarray(arr, np.float32).tobytes()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("X-Shape", ",".join(map(str, arr.shape)))
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n) if n else b""

        # ---- routes --------------------------------------------------
        def do_GET(self):
            if self.path == "/healthz":
                ok = server.pump_errors_consecutive < _UNHEALTHY_AFTER
                self._json(200 if ok else 503,
                           {"ok": ok,
                            "sessions": engine.active_sessions(),
                            "stats": engine.stats,
                            "pump_errors": server.pump_errors,
                            "latency": engine.latency_stats()})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                parts = [p for p in self.path.split("/") if p]
                if parts == ["v1", "sessions"]:
                    opts = json.loads(self._read_body() or b"{}")
                    sid = engine.create_session(
                        speaker=int(opts.get("speaker", 0)),
                        seed=int(opts.get("seed", 0)))
                    return self._json(200, {"id": sid})
                if (len(parts) == 4 and parts[:2] == ["v1", "sessions"]
                        and parts[3] in ("feed", "flush")):
                    sid = parts[2]
                    if parts[3] == "feed":
                        shape = tuple(
                            int(x) for x in
                            self.headers.get("X-Shape", "").split(","))
                        if self.headers.get("X-Dtype") == "int16":
                            if not engine.raw_audio:
                                raise ValueError(
                                    "X-Dtype: int16 is only valid for "
                                    "raw-audio (--pcm) engines")
                            dt = np.int16
                        else:
                            dt = np.float32
                        feats = np.frombuffer(
                            self._read_body(), dt).reshape(shape)
                        engine.feed(sid, feats, pump=False)
                        # wait one pump round so a lone client still gets
                        # its frames on the feed response
                        out = engine.poll(
                            sid, timeout=4 * server.pump_interval)
                        return self._frames(out)
                    out = engine.flush(sid)
                    return self._frames(out)
                return self._json(404, {"error": "not found"})
            except EngineBusy as e:
                return self._json(503, {"error": f"at capacity: {e}"})
            except SessionClosed as e:
                return self._json(410, {"error": f"session gone: {e}"})
            except Exception as e:       # surface to the client, keep serving
                return self._json(400, {"error": repr(e)})

    return Handler
