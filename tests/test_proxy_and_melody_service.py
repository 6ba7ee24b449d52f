"""Proxy relay + melody microservice wire tests."""

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from music_generation_tpu.serve.melody_service import make_melody_server
from music_generation_tpu.serve.proxy import make_proxy


class FakeMelodyGen:
    def generate(self, lyrics, index=0, previous_notes=None):
        n = len(lyrics)
        return lyrics + "AP", ["60"] * n + ["rest"], [0.4] * n + [0.6]


def _serve(server):
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server.server_address[1]


def test_melody_service_contract():
    server = make_melody_server(FakeMelodyGen(), "127.0.0.1", 0)
    port = _serve(server)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/?lyrics=%E4%BD%A0%E5%A5%BD") as r:
            out = json.loads(r.read())
        assert out["lyrics"].endswith("AP")
        assert out["pitch"][-1] == "rest"
        assert len(out["durations"]) == len(out["pitch"])
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert json.loads(r.read())["code"] == 201
    finally:
        server.shutdown()


def test_proxy_relays_and_reports_upstream_down():
    # upstream echo server
    class Echo(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    upstream = ThreadingHTTPServer(("127.0.0.1", 0), Echo)
    up_port = _serve(upstream)
    proxy = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_proxy(f"http://127.0.0.1:{up_port}", timeout=5))
    p_port = _serve(proxy)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{p_port}/synthesis_music",
            data=b'{"x": 1}', headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            assert json.loads(r.read()) == {"x": 1}
        # healthz handled locally
        with urllib.request.urlopen(f"http://127.0.0.1:{p_port}/healthz") as r:
            assert json.loads(r.read())["ok"] is True
    finally:
        upstream.shutdown()

    # upstream down -> 504 json
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{p_port}/synthesis_music", data=b"{}")
        try:
            urllib.request.urlopen(req)
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 504
            assert json.loads(e.read())["code"] == 504
        assert raised
    finally:
        proxy.shutdown()
