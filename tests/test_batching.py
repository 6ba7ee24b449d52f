"""Cross-request SVS micro-batching (serve/batching.py).

The reference's threaded Flask ran concurrent requests over shared CUDA
models with no locking; here concurrency is turned into batched device calls
instead of races or serialization.
"""

import threading

import numpy as np
import pytest

from music_generation_tpu.config import ServiceConfig
from music_generation_tpu.serve import MusicGenerationService
from music_generation_tpu.serve.batching import SVSBatcher


class FakeSVS:
    """Records every synthesize_batch call; output encodes the input."""

    def __init__(self):
        self.calls = []
        self.lock = threading.Lock()

    def synthesize_batch(self, scores):
        with self.lock:
            self.calls.append(list(scores))
        return [np.full(4, s, np.int16) for s in scores]


def _submit_concurrently(batcher, svs, submissions):
    """Run submissions from parallel threads; returns results in order."""
    results = [None] * len(submissions)
    barrier = threading.Barrier(len(submissions))

    def run(i):
        barrier.wait()
        results[i] = batcher.submit(svs, submissions[i])

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(len(submissions))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return results


def test_batcher_coalesces_concurrent_submissions():
    svs = FakeSVS()
    batcher = SVSBatcher(window_ms=100.0)
    subs = [[10 * i + j for j in range(2)] for i in range(4)]
    results = _submit_concurrently(batcher, svs, subs)
    for scores, wavs in zip(subs, results):
        assert [int(w[0]) for w in wavs] == scores
    # all 4 requests arrived within the window -> fewer device calls than
    # submissions (normally exactly one call with all 8 sentences)
    assert len(svs.calls) < 4
    assert sum(len(c) for c in svs.calls) == 8
    batcher.close()


def test_batcher_groups_by_synthesizer():
    a, b = FakeSVS(), FakeSVS()
    batcher = SVSBatcher(window_ms=100.0)
    results = [None, None]
    barrier = threading.Barrier(2)

    def run(i, svs, scores):
        barrier.wait()
        results[i] = batcher.submit(svs, scores)

    t1 = threading.Thread(target=run, args=(0, a, [1, 2]))
    t2 = threading.Thread(target=run, args=(1, b, [3]))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert [int(w[0]) for w in results[0]] == [1, 2]
    assert [int(w[0]) for w in results[1]] == [3]
    assert sum(len(c) for c in a.calls) == 2
    assert sum(len(c) for c in b.calls) == 1
    batcher.close()


def test_batcher_chunks_oversized_batches():
    svs = FakeSVS()
    batcher = SVSBatcher(window_ms=50.0, max_sentences=4)
    subs = [[i] * 3 for i in range(4)]  # 12 sentences, cap 4 -> >=3 calls
    results = _submit_concurrently(batcher, svs, subs)
    for scores, wavs in zip(subs, results):
        assert [int(w[0]) for w in wavs] == scores
    assert all(len(c) <= 4 for c in svs.calls)
    assert sum(len(c) for c in svs.calls) == 12
    batcher.close()


def test_batcher_splits_one_oversized_request():
    """A single long-lyrics request (max_text_len allows ~30 sentences)
    must also be capped per device call — b=32 full-size would OOM HBM."""
    svs = FakeSVS()
    batcher = SVSBatcher(max_sentences=16)
    scores = list(range(30))
    wavs = batcher.submit(svs, scores)
    assert [int(w[0]) for w in wavs] == scores
    assert all(len(c) <= 16 for c in svs.calls)
    assert sum(len(c) for c in svs.calls) == 30
    batcher.close()


def test_batcher_empty_submit():
    batcher = SVSBatcher()
    assert batcher.submit(FakeSVS(), []) == []
    batcher.close()


def test_batcher_propagates_errors():
    class Exploding:
        def synthesize_batch(self, scores):
            raise RuntimeError("device on fire")

    batcher = SVSBatcher()
    with pytest.raises(RuntimeError, match="device on fire"):
        batcher.submit(Exploding(), [1, 2])
    # batcher still alive for later submissions
    svs = FakeSVS()
    assert [int(w[0]) for w in batcher.submit(svs, [5])] == [5]
    batcher.close()


class FakeSongs:
    """SongSynthesizer stand-in capturing the svs_batch_fn wiring."""

    def __init__(self):
        self.synthesizers = {0: FakeSVS()}
        self.got_batch_fn = None

    def synthesize_song(self, text, singer_id=0, svs_batch_fn=None):
        self.got_batch_fn = svs_batch_fn
        wavs = svs_batch_fn([7]) if svs_batch_fn else [np.zeros(4, np.int16)]
        class R:
            wav_bytes = b"RIFF" + bytes(wavs[0].tobytes())
        return R()


def test_service_routes_svs_through_batcher(tmp_path):
    cfg = ServiceConfig(log_dir=str(tmp_path), svs_batching=True)
    songs = FakeSongs()
    svc = MusicGenerationService(songs, None, cfg)
    out = svc.handle_synthesis({"text": "你好世界"})
    assert out["code"] == 200
    assert songs.got_batch_fn is not None
    assert sum(len(c) for c in songs.synthesizers[0].calls) == 1
    assert svc._batcher.stats["device_calls"] == 1
    assert svc._batcher.stats["sentences"] == 1


def test_profile_endpoint_captures_trace(tmp_path):
    import json
    import threading
    import urllib.request

    from music_generation_tpu.serve import make_http_server
    cfg = ServiceConfig(log_dir=str(tmp_path))
    svc = MusicGenerationService(FakeSongs(), None, cfg)
    server = make_http_server(svc, "127.0.0.1", 0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/profile?seconds=0.1&dir=trace1",
            data=b"", method="POST")
        try:
            out = json.loads(urllib.request.urlopen(req, timeout=120).read())
        except urllib.error.HTTPError as e:
            # the (possibly remote) device profiler daemon can be wedged by
            # earlier sessions; the endpoint must still answer with JSON
            out = json.loads(e.read())
            assert e.code in (500, 504) and out["ok"] is False
        if out["ok"]:
            # traces are confined under <log_dir>/profile/<basename(dir)>
            assert out["trace_dir"] == str(tmp_path / "profile" / "trace1")
            import glob
            assert glob.glob(out["trace_dir"] + "/**/*.xplane.pb",
                             recursive=True)
        # malformed seconds -> JSON 400, not a connection reset
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/profile?seconds=abc",
            data=b"", method="POST")
        try:
            urllib.request.urlopen(bad, timeout=120)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert json.loads(e.read())["ok"] is False
    finally:
        server.shutdown()


def test_service_batching_disabled_falls_back(tmp_path):
    cfg = ServiceConfig(log_dir=str(tmp_path), svs_batching=False)
    songs = FakeSongs()
    svc = MusicGenerationService(songs, None, cfg)
    assert svc._batcher is None
    out = svc.handle_synthesis({"text": "你好世界"})
    assert out["code"] == 200
    assert songs.got_batch_fn is None
