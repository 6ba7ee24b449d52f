"""Benchmark: full keyword->WAV song latency on one chip.

Baseline (BASELINE.md): the reference serves a full /synthesis_music request
in 2.0-4.6 s typical (3.0 s median) on an unnamed CUDA GPU; north-star is
< 5 s on one TPU v5e chip. We time the complete model path — T5 lyric
sampling + per-sentence melody beam search + VISinger synthesis + WAV
encode — at production model sizes (random weights; compute is identical to
trained weights), after one warmup pass that pays all jit compiles.

Prints ONE JSON line:
  {"metric": "e2e_keyword_to_wav_latency_s", "value": ..., "unit": "s",
   "vs_baseline": value / 3.0, ...extras}
"""

import json
import time

BASELINE_S = 3.0  # reference median e2e latency (logs/logger_music_generation.log)
LYRICS = "小小的天有大大的梦想。重重的壳裹着轻轻的仰望。我知道我一直有双隐形的翅膀。带我飞飞过绝望"


def main():
    from music_generation_tpu.pipeline import build_default_song_synthesizer

    t0 = time.time()
    synth = build_default_song_synthesizer(tiny=False, n_speakers=1)
    build_s = time.time() - t0

    # Warmup: pays compile for every (phone, frame) bucket this song touches.
    t0 = time.time()
    warm = synth.synthesize_song(LYRICS, singer_id=0)
    warmup_s = time.time() - t0

    # Timed run (steady-state, same buckets).
    t0 = time.time()
    result = synth.synthesize_song(LYRICS, singer_id=0)
    e2e_s = time.time() - t0

    # Audio seconds produced -> real-time factor of the whole pipeline.
    import io
    from scipy.io import wavfile
    sr, wav = wavfile.read(io.BytesIO(result.wav_bytes))
    audio_s = len(wav) / sr

    print(json.dumps({
        "metric": "e2e_keyword_to_wav_latency_s",
        "value": round(e2e_s, 3),
        "unit": "s",
        "vs_baseline": round(e2e_s / BASELINE_S, 3),
        "audio_seconds": round(audio_s, 2),
        "pipeline_rtf": round(e2e_s / max(audio_s, 1e-6), 4),
        "n_sentences": len(result.lyrics_sentences),
        "warmup_s": round(warmup_s, 2),
        "build_s": round(build_s, 2),
    }))


if __name__ == "__main__":
    main()
