"""Standalone melody-only microservice.

Parity: Melody/flask_server.py:25-47 — GET /?lyrics=... ->
{"lyrics": ..., "durations": [...], "pitch": [...]} on :6900.
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def make_melody_server(melody_generator, host: str = "0.0.0.0",
                       port: int = 6900):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            parsed = urlparse(self.path)
            qs = parse_qs(parsed.query)
            lyrics = (qs.get("lyrics") or [""])[0]
            if not lyrics:
                payload = {"code": 201, "message": "missing lyrics"}
            else:
                out_lyrics, notes, durations = melody_generator.generate(lyrics)
                payload = {"lyrics": out_lyrics, "durations": durations,
                           "pitch": notes}
            body = json.dumps(payload, ensure_ascii=False).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):
            pass

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=6900)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    from ..frontend import load_lexicon
    from ..models.melody import (MelodyConfig, MelodyGenerator,
                                 lyric_dictionary_from_chars, note_dictionary)
    lyric_dict = lyric_dictionary_from_chars(
        sorted(load_lexicon().monosyllable.keys()))
    cfg = (MelodyConfig(src_vocab=lyric_dict.size, tgt_vocab=37, n_layers=1,
                        d_model=32, d_ff=64, n_heads=2)
           if args.tiny else
           MelodyConfig(src_vocab=lyric_dict.size, tgt_vocab=37))
    gen = MelodyGenerator(lyric_dict, note_dictionary(), cfg=cfg)
    server = make_melody_server(gen, port=args.port)
    print(f"melody service on :{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
