"""Threaded HTTP server with byte-range support + fault injection, for
exercising odc_stac_spark.sources.rangeio against a real network stack.

Supports:
- GET with a ``Range: bytes=a-b`` header → 206 + Content-Range
- HEAD → Content-Length
- ``server.fail_next = N`` → the next N requests answer 503 (retry path)
- ``server.ignore_range = True`` → Range headers ignored, 200 full body
  (the no-range-support fallback path)
- ``server.reject_head = True`` → HEAD answers 405 (GET-only endpoints,
  e.g. presigned S3/Azure URLs — the size-probe fallback path)
- ``server.n_requests`` counts every request served (including failures)
"""

from __future__ import annotations

import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):  # silence test output
        pass

    def _path(self):
        return os.path.join(self.server.root, self.path.lstrip("/"))

    def _maybe_fail(self) -> bool:
        srv = self.server
        with srv.lock:
            srv.n_requests += 1
            if srv.fail_next > 0:
                srv.fail_next -= 1
                self.send_response(503)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return True
        return False

    def do_HEAD(self):
        if self._maybe_fail():
            return
        if self.server.reject_head:
            self.send_response(405)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        p = self._path()
        if not os.path.isfile(p):
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(os.path.getsize(p)))
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()

    def do_PUT(self):
        if self._maybe_fail():
            return
        n = int(self.headers.get("Content-Length", "0"))
        body = self.rfile.read(n)
        with open(self._path(), "wb") as f:
            f.write(body)
        self.send_response(201)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_GET(self):
        if self._maybe_fail():
            return
        p = self._path()
        if not os.path.isfile(p):
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        size = os.path.getsize(p)
        rng = self.headers.get("Range")
        if rng and not self.server.ignore_range:
            spec = rng.split("=", 1)[1]
            lo_s, hi_s = spec.split("-", 1)
            lo = int(lo_s)
            hi = min(int(hi_s) if hi_s else size - 1, size - 1)
            if lo >= size:
                self.send_response(416)
                self.send_header("Content-Range", f"bytes */{size}")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            with open(p, "rb") as f:
                f.seek(lo)
                body = f.read(hi - lo + 1)
            self.send_response(206)
            self.send_header("Content-Range", f"bytes {lo}-{lo + len(body) - 1}/{size}")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        with open(p, "rb") as f:
            body = f.read()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


class RangeHTTPServer:
    """Context manager: serves ``root`` on 127.0.0.1:<ephemeral port>."""

    def __init__(self, root: str):
        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self.httpd.root = root
        self.httpd.fail_next = 0
        self.httpd.ignore_range = False
        self.httpd.reject_head = False
        self.httpd.n_requests = 0
        self.httpd.lock = threading.Lock()
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def url(self, name: str) -> str:
        return f"http://127.0.0.1:{self.port}/{name}"

    # fault-injection knobs
    @property
    def n_requests(self) -> int:
        return self.httpd.n_requests

    def set_fail_next(self, n: int) -> None:
        with self.httpd.lock:
            self.httpd.fail_next = n

    def set_ignore_range(self, flag: bool) -> None:
        self.httpd.ignore_range = flag

    def set_reject_head(self, flag: bool) -> None:
        self.httpd.reject_head = flag

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.httpd.shutdown()
        self.httpd.server_close()
