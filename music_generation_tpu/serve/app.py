"""HTTP song-generation service (stdlib, no flask dependency).

Same wire contract as the reference controllers
(controllers_music_generation_svs_v*_multispeaker/syn_music.py):
  POST /synthesis_music
    body (json or form): text | keyword, singer_id (0=default, 1, 2)
    -> {code: 200, message, data: {lyrics, audio: <b64 wav>}}
    errors: 201 missing input, 202 length guard (1..500), 203 synth error
  GET /healthz -> {ok: true}

Deviations (documented): the reference runs threaded Flask over module-global
CUDA models with no locking (race hazard, SURVEY.md §5); here synthesis is
serialized behind a lock while HTTP I/O stays threaded.
"""

from __future__ import annotations

import argparse
import base64
import json
import logging
import os
import threading
import time
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs

from ..config import ServiceConfig


def make_logger(cfg: ServiceConfig) -> logging.Logger:
    logger = logging.getLogger(cfg.log_name)
    if not logger.handlers:
        logger.setLevel(logging.INFO)
        os.makedirs(cfg.log_dir, exist_ok=True)
        fh = logging.FileHandler(
            os.path.join(cfg.log_dir, f"logger_{cfg.log_name}.log"),
            encoding="utf-8")
        fh.setFormatter(logging.Formatter(
            "%(asctime)s - %(levelname)s - %(message)s"))
        logger.addHandler(fh)
        logger.addHandler(logging.StreamHandler())
    return logger


class MusicGenerationService:
    """Transport-independent request handling (unit-testable)."""

    def __init__(self, song_synthesizer, lyric_generator=None,
                 cfg: Optional[ServiceConfig] = None,
                 logger: Optional[logging.Logger] = None,
                 shell_backend=None, canned_dir=None,
                 fused_synthesizer=None):
        self.songs = song_synthesizer
        self.lyrics = lyric_generator
        self.cfg = cfg or ServiceConfig()
        self.logger = logger or make_logger(self.cfg)
        self.shell_backend = shell_backend
        self.canned_dir = canned_dir
        # measured-fastest single-request path (pipeline/fused.py: the whole
        # lyrics->waveform program in ONE device call). Auto-picked by load:
        # a lone request takes the fused program; concurrent requests take
        # the staged path so the cross-request SVS batcher can coalesce them.
        self.fused = fused_synthesizer
        self._inflight = 0
        self._inflight_lock = threading.Lock()
        self._lock = threading.Lock()
        self._profile_lock = threading.Lock()  # one profiler trace at a time
        # cross-request SVS micro-batching: concurrent requests coalesce
        # their sentences into one device call (serve/batching.py); the
        # melody stage is serialized inside SongSynthesizer instead of
        # holding the request-level lock for the whole synthesis
        self._batcher = None
        import inspect
        if (self.cfg.svs_batching and song_synthesizer is not None
                and hasattr(song_synthesizer, "synthesizers")
                and "svs_batch_fn" in inspect.signature(
                    song_synthesizer.synthesize_song).parameters):
            from .batching import SVSBatcher
            self._batcher = SVSBatcher(
                window_ms=self.cfg.batch_window_ms,
                max_sentences=self.cfg.max_batch_sentences)

    def handle_pipeline(self, data: dict) -> dict:
        """Shell-pipeline path (v1 controller parity): mode heuristics ->
        ShellPipelineBackend -> {mode, lyrics, lrc, audio}."""
        from .modes import decide_mode
        mode, payload = decide_mode(data)
        if mode is None:
            return {"code": 201,
                    "message": "输入参数错误：请提供 keyword/theme（主题）或 "
                               "text/raw_lyrics（歌词）。"}
        self.logger.info("判定模式：%s；payload_keys=%s", mode,
                         list(payload.keys()))
        try:
            result = self.shell_backend.run(payload)
            with open(result["audio_path"], "rb") as f:
                audio_b64 = base64.b64encode(f.read()).decode("ascii")
            return {"code": 200, "message": "success！",
                    "data": {"mode": mode, "lyrics": result["lyrics"],
                             "lrc": result["lrc"], "audio": audio_b64}}
        except Exception:
            self.logger.error("pipeline failed:\n%s", traceback.format_exc())
            return {"code": 203, "message": "服务器错误：生成失败（pipeline）"}

    def handle_synthesis(self, data: dict) -> dict:
        if self.cfg.backend == "shell" and self.shell_backend is not None:
            result = self.handle_pipeline(data)
            # graceful fallback to the model path (parity:
            # controllers_music_generation_svs_v5/syn_music.py:97-120)
            if result["code"] == 200 or self.songs is None:
                return result
            self.logger.info("shell backend failed -> falling back to model path")
        return self._handle_model_path(data)

    def _resolve_text(self, data: dict):
        """(lyrics_text, None) from a request payload, or (None, response
        dict) when the request resolves to an error/canned response."""
        text = str(data.get("text", "") or "").strip()
        if not text:
            keyword = str(data.get("keyword", "") or data.get("theme", "") or "").strip()
            if not keyword:
                return None, {"code": 201,
                              "message": "输入参数错误，必须输入非空字段text！"}
            # canned demo songs for specific keywords (parity:
            # controllers_music_generation_melody_v2/syn_music.py:30-54)
            from .variants import canned_response
            canned = canned_response(keyword, self.canned_dir)
            if canned is not None:
                self.logger.info("canned response for 关键词:%s", keyword)
                return None, canned
            if self.lyrics is None:
                return None, {"code": 201,
                              "message": "keyword 模式不可用：歌词模型未加载！"}
            self.logger.info("传入关键词:%s", keyword)
            text = self.lyrics.generate(keyword).replace("-", "")
            self.logger.info("生成歌词：%s", text)
        else:
            self.logger.info("直接传入歌词:%s", text)

        if not (self.cfg.min_text_len <= len(text) <= self.cfg.max_text_len):
            return None, {"code": 202,
                          "message": "生成失败，传入文本必须大于1个字符，小于500个字符！"}
        return text, None

    def stream_synthesis(self, data: dict):
        """Streaming model path: returns a generator of int16 numpy chunks,
        or a response dict (error / canned keyword) the caller should send
        as plain JSON. Audio leaves the service one vocoder decode window
        at a time (SongSynthesizer.stream_song) — time-to-first-audio is
        one window instead of the whole song."""
        if self.songs is None or not hasattr(self.songs, "stream_song"):
            return {"code": 203, "message": "服务器错误：流式合成不可用！"}
        text, resp = self._resolve_text(data)
        if resp is not None:
            return resp
        try:
            singer_id = int(data.get("singer_id", 0) or 0)
        except (TypeError, ValueError):
            return {"code": 203, "message": "服务器错误，歌声合成出错！"}
        return self.songs.stream_song(text, singer_id=singer_id)

    def _handle_model_path(self, data: dict) -> dict:
        text, resp = self._resolve_text(data)
        if resp is not None:
            return resp

        try:
            # inside the handler try so a non-numeric singer_id yields the
            # code-203 JSON the wire contract promises, not a raw 500
            singer_id = int(data.get("singer_id", 0) or 0)
            t0 = time.time()
            with self._inflight_lock:
                self._inflight += 1
                alone = self._inflight == 1
            try:
                if self.fused is not None and (alone or self._batcher is None):
                    # single in-flight request -> one-device-call fast path
                    with self._lock:
                        result = self.fused.synthesize_song(
                            text, singer_id=singer_id)
                elif self._batcher is not None:
                    svs = self.songs.synthesizers.get(
                        singer_id, self.songs.synthesizers[0])
                    result = self.songs.synthesize_song(
                        text, singer_id=singer_id,
                        svs_batch_fn=self._batcher.fn_for(svs))
                else:
                    with self._lock:
                        result = self.songs.synthesize_song(
                            text, singer_id=singer_id)
            finally:
                with self._inflight_lock:
                    self._inflight -= 1
            b64 = base64.b64encode(result.wav_bytes).decode()
            self.logger.info("音频合成耗时：%.3f 秒。", time.time() - t0)
            return {"code": 200, "message": "success！",
                    "data": {"lyrics": text, "audio": b64}}
        except Exception:
            self.logger.error("synthesis failed:\n%s", traceback.format_exc())
            return {"code": 203, "message": "服务器错误，歌声合成出错！"}


def make_http_server(service: MusicGenerationService, host: str, port: int,
                     cert_file: Optional[str] = None,
                     key_file: Optional[str] = None):
    """ThreadingHTTPServer for the service; HTTPS when cert_file is given.

    The reference declares `cert_file_path` in its server config
    (server_configs/config_music_generation.yaml:12) but never terminates
    TLS with it; here the same field actually enables TLS. `cert_file` is a
    PEM certificate (chain); `key_file` is its private key, or None when the
    key is appended to the cert PEM.
    """
    class Handler(BaseHTTPRequestHandler):
        # chunked transfer (the streaming endpoint) requires HTTP/1.1;
        # every non-streaming response already sets Content-Length, so
        # keep-alive semantics stay correct
        protocol_version = "HTTP/1.1"
        def _send_json(self, payload: dict, status: int = 200):
            body = json.dumps(payload, ensure_ascii=False).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Access-Control-Allow-Origin", "*")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.rstrip("/") in ("", "/healthz", "healthz") or \
                    self.path == "/healthz":
                payload = {"ok": True}
                if service._batcher is not None:
                    payload["batching"] = dict(service._batcher.stats)
                if service.fused is not None:
                    payload["fused"] = True
                self._send_json(payload)
            elif self.path.startswith("/syn_outputs/"):
                # static output serving (parity: the v1 app exposes
                # syn_outputs/ for the demo UI)
                rel = os.path.normpath(self.path[len("/syn_outputs/"):])
                base = os.path.abspath("./syn_outputs")
                full = os.path.abspath(os.path.join(base, rel))
                if full.startswith(base + os.sep) and os.path.isfile(full):
                    with open(full, "rb") as f:
                        body = f.read()
                    ctype = ("audio/wav" if full.endswith(".wav")
                             else "text/plain; charset=utf-8")
                    self.send_response(200)
                    self.send_header("Content-Type", ctype)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._send_json({"code": 404, "message": "not found"}, 404)
            else:
                self._send_json({"code": 404, "message": "not found"}, 404)

        def do_POST(self):
            parsed_path = self.path.split("?")[0].rstrip("/")
            if parsed_path == "/profile":
                # capture a jax.profiler trace of live traffic (open with
                # TensorBoard/xprof); ?seconds=N bounds the capture window.
                # Traces always land under <log_dir>/profile/<subdir> (the
                # dir param picks the subdir, not an arbitrary path), and
                # only one capture runs at a time.
                from urllib.parse import parse_qs as _pq, urlparse as _up
                q = _pq(_up(self.path).query)
                try:
                    seconds = min(max(
                        float(q.get("seconds", ["2"])[0]), 0.0), 60.0)
                except ValueError:
                    self._send_json({"ok": False,
                                     "message": "seconds must be a number"},
                                    400)
                    return
                sub = os.path.basename(q.get("dir", ["profile"])[0]) or \
                    "profile"
                log_dir = os.path.join(service.cfg.log_dir, "profile", sub)
                if not service._profile_lock.acquire(blocking=False):
                    self._send_json({"ok": False,
                                     "message": "a trace is already running"},
                                    409)
                    return
                # run the capture on a worker with a bounded join: on this
                # backend stop_trace contacts the (remote) device profiler
                # daemon and can wedge — the endpoint must answer regardless
                outcome = {}

                def _capture():
                    try:
                        import jax as _jax
                        _jax.profiler.start_trace(log_dir)
                        time.sleep(seconds)
                        _jax.profiler.stop_trace()
                        outcome["ok"] = True
                    except Exception as e:
                        outcome["error"] = str(e)
                    finally:
                        service._profile_lock.release()

                worker = threading.Thread(target=_capture, daemon=True)
                worker.start()
                worker.join(timeout=seconds + 30.0)
                if worker.is_alive():
                    self._send_json(
                        {"ok": False,
                         "message": "profiler did not finish (device "
                                    "profiler daemon unresponsive)"}, 504)
                elif "error" in outcome:
                    self._send_json({"ok": False,
                                     "message": outcome["error"]}, 500)
                else:
                    self._send_json({"ok": True, "trace_dir": log_dir,
                                     "seconds": seconds})
                return
            if parsed_path not in ("/synthesis_music",
                                   "/synthesis_music_stream"):
                self._send_json({"code": 404, "message": "not found"}, 404)
                return
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            try:
                if ctype.startswith("application/json"):
                    data = json.loads(raw or b"{}")
                else:
                    data = {k: v[0] for k, v in
                            parse_qs(raw.decode(errors="replace")).items()}
            except Exception:
                data = {}
            if parsed_path == "/synthesis_music_stream":
                self._stream_synthesis(data)
                return
            self._send_json(service.handle_synthesis(data))

        def _stream_synthesis(self, data):
            """Chunked-transfer audio/wav: one HTTP chunk per vocoder decode
            window. Errors before the first audio byte fall back to the
            JSON wire contract."""
            gen = service.stream_synthesis(data)
            if isinstance(gen, dict):
                self._send_json(gen)
                return
            from ..audio.wav import streaming_wav_header
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def chunk(b: bytes):
                self.wfile.write(b"%X\r\n" % len(b))
                self.wfile.write(b)
                self.wfile.write(b"\r\n")

            try:
                chunk(streaming_wav_header())
                for piece in gen:
                    b = piece.tobytes()
                    if b:
                        chunk(b)
            except Exception:
                service.logger.error("stream failed mid-flight:\n%s",
                                     traceback.format_exc())
            finally:
                try:
                    self.wfile.write(b"0\r\n\r\n")
                except OSError:
                    pass

        def log_message(self, fmt, *args):
            service.logger.info("%s - %s", self.address_string(), fmt % args)

    server = ThreadingHTTPServer((host, port), Handler)
    if cert_file:
        import ssl
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(cert_file, keyfile=key_file)
        server.socket = ctx.wrap_socket(server.socket, server_side=True)
    return server


def main(argv=None):
    parser = argparse.ArgumentParser(description="music_generation_tpu server")
    parser.add_argument("--config", default=None)
    parser.add_argument("--port", type=int, default=None)
    parser.add_argument("--host", default=None)
    parser.add_argument("--tiny", action="store_true",
                        help="random tiny models (smoke testing)")
    parser.add_argument("--variant", default="svs_v6_multispeaker",
                        choices=["v1", "v1_model", "melody_v2", "svs_v5",
                                 "svs_v5_multispeaker", "svs_v6_multispeaker"],
                        help="reference server variant preset")
    parser.add_argument("--lyric-model", default="t5", choices=["t5", "gpt2"])
    parser.add_argument("--checkpoint-dir", default=None,
                        help="orbax pipeline checkpoints (compat.save_pipeline"
                             " / tools/import_reference_checkpoints.py)")
    parser.add_argument("--mesh", default=None, metavar="DATAxMODEL",
                        help="multi-chip SVS inference mesh, e.g. 4x2: "
                             "sentences sharded over `data`, params "
                             "tensor-parallel over `model`")
    parser.add_argument("--fused", action="store_true",
                        help="serve the fused lyrics->WAV single-device-call "
                             "program for single-request latency; concurrent "
                             "requests still take the staged path + "
                             "cross-request SVS batcher (auto-pick by load)")
    parser.add_argument("--nsf", action="store_true",
                        help="SVS checkpoints were trained with `train "
                             "--nsf` (harmonic-excitation vocoder; the "
                             "model config must match the params)")
    parser.add_argument("--decoder", default="hifigan",
                        choices=["hifigan", "istft", "mb_istft"],
                        help="SVS vocoder decoder family the checkpoints "
                             "were trained with (train --decoder)")
    parser.add_argument("--decoder-bf16", action="store_true",
                        help="run the vocoder decoder in bfloat16 (fp32 "
                             "params; halves the bandwidth-bound decoder's "
                             "byte traffic — see bench.py bf16 rows; "
                             "output deviation bounded by "
                             "tests/test_bf16_decoder.py)")
    parser.add_argument("--f0", default="predict",
                        choices=["predict", "score"],
                        help="inference F0 source: 'predict' = the trained "
                             "F0Predictor (reference parity); 'score' = "
                             "frame F0 derived from the score's MIDI notes "
                             "(in tune by construction — SVSConfig.f0_mode)")
    parser.add_argument("--f0-residual", action="store_true",
                        help="checkpoints were trained with train "
                             "--f0-residual (the F0 head is a deviation "
                             "around the note pitch; SVSConfig.f0_residual)")
    parser.add_argument("--cert-file", default=None,
                        help="PEM certificate: serve HTTPS (the reference's "
                             "cert_file_path config field, actually "
                             "terminated here)")
    parser.add_argument("--key-file", default=None,
                        help="PEM private key for --cert-file (omit when "
                             "the key is appended to the cert PEM)")
    parser.add_argument("--warmup", action="store_true",
                        help="synthesize one representative song before "
                             "accepting traffic so the common shape buckets "
                             "are compiled (first remote compile takes "
                             "minutes; warm requests are sub-second)")
    args = parser.parse_args(argv)
    if args.nsf and args.decoder != "hifigan":
        # fail at parse time, not minutes later in VISinger setup
        # (visinger.py decoder wiring: NSF excitation is hifigan-only)
        parser.error("--nsf requires --decoder hifigan")

    cfg = ServiceConfig.from_file(args.config) if args.config else ServiceConfig()
    cfg = ServiceConfig.from_env(cfg)
    if args.port:
        cfg.port = args.port
    if args.host:
        cfg.host = args.host
    if args.tiny:
        cfg.tiny = True
    if args.checkpoint_dir:
        cfg.checkpoint_dir = args.checkpoint_dir

    logger = make_logger(cfg)
    from .variants import VARIANTS, build_melody_generator
    spec = VARIANTS[args.variant]
    if spec.backend == "shell":
        cfg.backend = "shell"
    cfg.n_speakers = max(cfg.n_speakers, spec.n_speakers)
    logger.info("loading models (variant=%s tiny=%s)...", spec.name, cfg.tiny)

    from ..pipeline import SongSynthesizer, build_default_song_synthesizer
    from ..models.lyrics import (GPT2Config, LyricGeneratorGPT2,
                                 LyricGeneratorT5, T5Config,
                                 default_tokenizer)

    mesh = None
    if args.mesh:
        import jax
        from ..parallel import make_mesh
        n_data, n_model = (int(x) for x in args.mesh.lower().split("x"))
        mesh = make_mesh(n_data=n_data, n_model=n_model,
                         devices=jax.devices()[: n_data * n_model])
        logger.info("inference mesh: %s", dict(mesh.shape))
    songs = build_default_song_synthesizer(tiny=cfg.tiny,
                                           n_speakers=cfg.n_speakers,
                                           mesh=mesh, svs_nsf=args.nsf,
                                           svs_decoder=args.decoder,
                                           svs_decoder_bf16=args.decoder_bf16,
                                           svs_f0_mode=args.f0,
                                           svs_f0_residual=args.f0_residual)
    if spec.melody != "mse" or spec.accompaniment:  # variant melody family
        songs = SongSynthesizer(build_melody_generator(spec, tiny=cfg.tiny),
                                songs.synthesizers,
                                mix_accompaniment=spec.accompaniment)
    if spec.censor_lyrics:
        from ..pipeline.synthesis import LYRIC_REPLACEMENTS
        songs.lyric_replacements = LYRIC_REPLACEMENTS
    if cfg.checkpoint_dir:
        from ..compat import load_pipeline
        load_pipeline(cfg.checkpoint_dir, songs)
        logger.info("loaded checkpoints from %s", cfg.checkpoint_dir)
    tok = default_tokenizer(args.lyric_model, tiny=cfg.tiny)
    if args.lyric_model == "gpt2":
        gcfg = (GPT2Config(vocab_size=tok.vocab_size, n_layer=1, n_embd=32,
                           n_head=2, n_positions=128) if cfg.tiny
                else GPT2Config(vocab_size=tok.vocab_size))
        lyric_gen = LyricGeneratorGPT2(gcfg, tokenizer=tok)
    else:
        t5cfg = (T5Config(vocab_size=tok.vocab_size, d_model=32, d_kv=8,
                          d_ff=64, num_layers=1, num_decoder_layers=1,
                          num_heads=4)
                 if cfg.tiny else T5Config(vocab_size=tok.vocab_size))
        lyric_gen = LyricGeneratorT5(t5cfg, tokenizer=tok)
    fused = None
    if args.fused:
        if hasattr(songs.melody, "_song_impl"):
            from ..pipeline.fused import FusedSongSynthesizer
            fused = FusedSongSynthesizer(
                songs.melody, songs.synthesizers,
                lyric_replacements=songs.lyric_replacements)
            logger.info("fused single-call path enabled (auto-pick by load)")
        else:
            logger.warning("--fused needs the transformer melody family "
                           "(variant %s uses %s) — ignored",
                           spec.name, type(songs.melody).__name__)
    from ..pipeline.shell_backend import ShellPipelineBackend
    shell = ShellPipelineBackend(lyric_fn=lyric_gen.generate)
    service = MusicGenerationService(songs, lyric_gen, cfg, logger,
                                     shell_backend=shell,
                                     canned_dir=spec.canned_dir,
                                     fused_synthesizer=fused)

    if args.warmup:
        warm_text = "你好世界。小小的天有大大的梦想。隐形的翅膀。带我飞过绝望"
        t0 = time.time()
        out = service.handle_synthesis({"text": warm_text})
        logger.info("warmup request code=%s in %.1fs",
                    out.get("code"), time.time() - t0)
        if fused is not None:
            # the request above warmed the fused program; also compile the
            # staged path concurrent requests fall back to
            t0 = time.time()
            songs.synthesize_song(warm_text)
            logger.info("staged-path warmup in %.1fs", time.time() - t0)

    cert = args.cert_file or cfg.cert_file_path
    server = make_http_server(service, cfg.host, cfg.port,
                              cert_file=cert, key_file=args.key_file)
    logger.info("serving on %s:%d%s", cfg.host, cfg.port,
                " (TLS)" if cert else "")
    server.serve_forever()


if __name__ == "__main__":
    main()
