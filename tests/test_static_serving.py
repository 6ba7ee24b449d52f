"""Static syn_outputs serving + path traversal guard."""

import json
import os
import threading
import urllib.error
import urllib.request

import pytest

from music_generation_tpu.config import ServiceConfig
from music_generation_tpu.serve import MusicGenerationService, make_http_server


class _NoSongs:
    def synthesize_song(self, *a, **k):
        raise RuntimeError("unused")


@pytest.fixture()
def server(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs("syn_outputs", exist_ok=True)
    with open("syn_outputs/demo.txt", "w", encoding="utf-8") as f:
        f.write("hello 歌")
    svc = MusicGenerationService(_NoSongs(), None,
                                 ServiceConfig(log_dir=str(tmp_path / "logs")))
    srv = make_http_server(svc, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv.server_address[1]
    srv.shutdown()


def test_serves_static_file(server):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server}/syn_outputs/demo.txt") as r:
        assert "hello" in r.read().decode()


def test_blocks_path_traversal(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(
            f"http://127.0.0.1:{server}/syn_outputs/../secret.txt")
    assert e.value.code == 404


def test_missing_file_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(
            f"http://127.0.0.1:{server}/syn_outputs/nope.wav")
    assert e.value.code == 404
