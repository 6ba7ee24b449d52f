"""HTTP service tests: wire contract parity with the reference controllers."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from scipy.io import wavfile

from music_generation_tpu.config import ServiceConfig
from music_generation_tpu.pipeline import build_default_song_synthesizer
from music_generation_tpu.serve import MusicGenerationService, make_http_server


class FakeLyrics:
    def generate(self, keyword):
        return "你好世界。小小的天有大大的梦想"


@pytest.fixture(scope="module")
def service():
    songs = build_default_song_synthesizer(tiny=True, n_speakers=1)
    cfg = ServiceConfig(log_dir="/tmp/mgt_test_logs")
    return MusicGenerationService(songs, FakeLyrics(), cfg)


def test_missing_input_gives_201(service):
    out = service.handle_synthesis({})
    assert out["code"] == 201


def test_length_guard_gives_202(service):
    out = service.handle_synthesis({"text": "歌" * 501})
    assert out["code"] == 202


def test_text_mode_succeeds(service):
    out = service.handle_synthesis({"text": "你好世界"})
    assert out["code"] == 200
    wav_bytes = base64.b64decode(out["data"]["audio"])
    sr, wav = wavfile.read(io.BytesIO(wav_bytes))
    assert sr == 22050 and wav.dtype == np.int16
    assert out["data"]["lyrics"] == "你好世界"


def test_keyword_mode_generates_lyrics(service):
    out = service.handle_synthesis({"keyword": "夏天"})
    assert out["code"] == 200
    assert "梦想" in out["data"]["lyrics"]


def test_http_roundtrip(service):
    server = make_http_server(service, "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # healthz
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.loads(r.read())["ok"] is True
        # synthesis (json body)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesis_music",
            data=json.dumps({"text": "你好世界"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["code"] == 200
        # form body
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesis_music",
            data=b"text=%E4%BD%A0%E5%A5%BD%E4%B8%96%E7%95%8C",
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        with urllib.request.urlopen(req, timeout=300) as r:
            assert json.loads(r.read())["code"] == 200
    finally:
        server.shutdown()


def test_https_roundtrip(service, tmp_path):
    """cert_file_path terminates TLS (reference declares the field at
    server_configs/config_music_generation.yaml:12 but never uses it;
    here it actually serves HTTPS)."""
    import ssl
    import subprocess
    pem = tmp_path / "server.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(pem), "-out", str(pem), "-days", "1",
         "-subj", "/CN=localhost"],
        check=True, capture_output=True)
    server = make_http_server(service, "127.0.0.1", 0, cert_file=str(pem))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        with urllib.request.urlopen(f"https://127.0.0.1:{port}/healthz",
                                    context=ctx) as r:
            assert json.loads(r.read())["ok"] is True
    finally:
        server.shutdown()


def test_fused_serving_path():
    """--fused: the service routes a lone request through the fused
    single-device-call synthesizer and falls back to the staged path under
    concurrency (auto-pick by load); healthz reports fused=true."""
    from music_generation_tpu.pipeline.fused import FusedSongSynthesizer

    songs = build_default_song_synthesizer(tiny=True, n_speakers=1)
    fused = FusedSongSynthesizer(songs.melody, songs.synthesizers)
    calls = {"fused": 0}
    real = fused.synthesize_song

    def counting(*a, **k):
        calls["fused"] += 1
        return real(*a, **k)

    fused.synthesize_song = counting
    cfg = ServiceConfig(log_dir="/tmp/mgt_test_logs")
    service = MusicGenerationService(songs, FakeLyrics(), cfg,
                                     fused_synthesizer=fused)
    out = service.handle_synthesis({"text": "你好世界"})
    assert out["code"] == 200
    assert calls["fused"] == 1
    wav_bytes = base64.b64decode(out["data"]["audio"])
    sr, wav = wavfile.read(io.BytesIO(wav_bytes))
    assert sr == 22050 and wav.dtype == np.int16

    # under load (a request already in flight) the staged path is used
    service._inflight = 1
    out = service.handle_synthesis({"text": "你好世界"})
    service._inflight = 0
    assert out["code"] == 200 and calls["fused"] == 1

    server = make_http_server(service, "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            payload = json.loads(r.read())
        assert payload["ok"] is True and payload["fused"] is True
    finally:
        server.shutdown()
