"""Blocking HTTP relay :5500 -> :5005 (parity: proxy_5500_to_5005.py:9-18,
900 s read timeout), stdlib-only."""

from __future__ import annotations

import argparse
import json
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

UPSTREAM = "http://127.0.0.1:5005"
TIMEOUT_S = 900


def make_proxy(upstream: str = UPSTREAM, timeout: float = TIMEOUT_S):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.startswith("/healthz"):
                body = json.dumps({"ok": True}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            req = urllib.request.Request(
                upstream + self.path, data=raw,
                headers={"Content-Type":
                         self.headers.get("Content-Type", "application/json")})
            try:
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    body = resp.read()
                    self.send_response(resp.status)
                    self.send_header("Content-Type",
                                     resp.headers.get("Content-Type",
                                                      "application/json"))
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
            except Exception as e:  # upstream down / timeout
                body = json.dumps({"code": 504,
                                   "message": f"upstream error: {e}"}).encode()
                self.send_response(504)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        def log_message(self, fmt, *args):
            pass

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=5500)
    p.add_argument("--upstream", default=UPSTREAM)
    args = p.parse_args(argv)
    server = ThreadingHTTPServer(("0.0.0.0", args.port),
                                 make_proxy(args.upstream))
    print(f"proxy :{args.port} -> {args.upstream}")
    server.serve_forever()


if __name__ == "__main__":
    main()
