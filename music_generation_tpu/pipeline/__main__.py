"""CLI: synthesize a song from lyrics (or a pipe-format score line).

Examples:
  python -m music_generation_tpu.pipeline --text "你好世界。小小的天" out.wav
  python -m music_generation_tpu.pipeline --score "t|啊|C4|0.5" out.wav --tiny
"""

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description="song synthesis CLI")
    p.add_argument("output", help="output WAV path")
    p.add_argument("--text", help="lyrics text")
    p.add_argument("--keyword", help="theme keyword (lyrics via the T5 LM; "
                                     "parity: melody_generate_with_keywords_v2)")
    p.add_argument("--score", help="pipe-format score line "
                                   "(name|lyrics|pitches|durations)")
    p.add_argument("--singer-id", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)
    if not args.text and not args.score and not args.keyword:
        p.error("need --text, --keyword or --score")

    from .synthesis import build_default_song_synthesizer
    from ..audio.wav import normalize_int16, write_wav

    t0 = time.time()
    synth = build_default_song_synthesizer(tiny=args.tiny, n_speakers=1)
    print(f"models ready in {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    if args.score:
        wav = synth.synthesizers[0].synthesize_pipe_format(args.score)
        write_wav(args.output, normalize_int16(wav))
    else:
        text = args.text
        if not text:
            from ..models.lyrics import (LyricGeneratorT5, T5Config,
                                         default_tokenizer)
            tok = default_tokenizer("t5", tiny=args.tiny)
            cfg = (T5Config(vocab_size=tok.vocab_size, d_model=32, d_kv=8,
                            d_ff=64, num_layers=1, num_decoder_layers=1,
                            num_heads=4) if args.tiny
                   else T5Config(vocab_size=tok.vocab_size))
            text = LyricGeneratorT5(cfg, tokenizer=tok).generate(args.keyword)
            print(f"lyrics: {text}", file=sys.stderr)
        result = synth.synthesize_song(text, singer_id=args.singer_id)
        with open(args.output, "wb") as f:
            f.write(result.wav_bytes)
    print(f"synthesized in {time.time() - t0:.2f}s -> {args.output}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
