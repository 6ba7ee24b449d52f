"""Benchmark: full song-synthesis latency on one chip, workload-honest.

Baseline (BASELINE.md): the reference serves a full /synthesis_music request
in 2.0-4.6 s typical (3.0 s median) on an unnamed CUDA GPU, producing roughly
10-20 s of audio; north-star is < 5 s on one TPU v5e chip.

This bench runs the production-size models (random weights; compute identical
to trained weights) end-to-end — per-sentence melody beam search + duration
regression + VISinger synthesis + WAV encode — but pins note durations to a
realistic 0.4 s/syllable so the vocoder workload matches what trained melody
weights produce (random duration heads emit near-zero durations, which would
flatter the number).

Timeout-proof structure (round-4 lesson: BENCH_r04 was rc=124 with nothing
printed because the single JSON line came after five fresh multi-minute
remote compiles): the headline JSON line is printed IMMEDIATELY after the
core e2e + b=16 throughput measurements, then each optional row runs under a
wall-clock budget (skipped with a logged reason when the remaining budget
can't cover its compile) and the completed JSON line is RE-printed after
every row — the driver parses the last line, so whatever finishes is
captured even if the process is killed mid-row.
"""

import json
import os
import time

T_START = time.time()
# Total wall budget before optional rows stop being attempted. The driver's
# timeout killed round 4's bench; headline-first + per-row re-prints mean a
# kill only loses rows that hadn't finished, never the whole result.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "2400"))
# A fresh full-size SVSSynthesizer config pays a remote TPU compile
# (~2-5 min); don't start a row the budget can't plausibly cover.
ROW_EST_S = 300.0

BASELINE_S = 3.0  # reference median e2e latency (logs/logger_music_generation.log)
SENTENCES = ["小小的天有大大的梦想", "重重的壳裹着轻轻的仰望",
             "我知道我一直有双隐形的翅膀", "带我飞飞过绝望"]
SYLLABLE_SECONDS = 0.4


def run_song(synth, melody):
    """Melody (notes via beam search, sequential conditioning) + ONE batched
    SVS call for all sentences; pinned durations."""
    from music_generation_tpu.frontend import midi_to_note
    from music_generation_tpu.audio.wav import (concat_with_delay,
                                                write_wav_bytes)
    t0 = time.time()
    scores = []
    n_tokens = 0
    for out_lyric, note_tokens, _ in melody.generate_song(SENTENCES):
        names = [midi_to_note(int(m)) if m != "rest" else "rest"
                 for m in note_tokens]
        n_tokens += len(note_tokens)
        durations = [SYLLABLE_SECONDS] * (len(out_lyric) - 1) + [0.6]
        scores.append(synth.frontend.align(out_lyric, names, durations))
    melody_s = time.time() - t0
    run_song.last_melody_tokens = n_tokens
    t0 = time.time()
    wavs = synth.synthesize_batch(scores)  # int16, normalized on device
    svs_s = time.time() - t0
    song = concat_with_delay(wavs, 0.2)
    return write_wav_bytes(song), melody_s, svs_s


def timed_throughput(synth, workload):
    """min-of-3 wall time; synthesize_batch dispatches every chunk before
    collecting, so H2D/compute/D2H pipeline across chunks."""
    wavs = synth.synthesize_batch(workload)  # warmup all buckets
    runs = []
    for _ in range(3):
        t0 = time.time()
        wavs = synth.synthesize_batch(workload)
        runs.append(time.time() - t0)
    return min(runs), sum(len(w) for w in wavs) / 22050.0


def main():
    from music_generation_tpu.pipeline import build_default_song_synthesizer

    result = {
        "metric": "e2e_song_latency_s", "value": None, "unit": "s",
        "vs_baseline": None, "audio_seconds": None, "pipeline_rtf": None,
        "n_sentences": len(SENTENCES), "melody_s": None,
        "melody_tokens_per_s": None, "svs_s": None, "fused_e2e_s": None,
        "fused_audio_s": None, "throughput_songs_per_s": None,
        "throughput_audio_s_per_s": None, "batched_svs_flops": None,
        "mfu_vs_bf16_peak_pct": None, "bandwidth_util_pct": None,
        "ttfa_s": None,
        "throughput_audio_s_per_s_bf16": None,
        "throughput_audio_s_per_s_bf16_b32": None,
        "throughput_audio_s_per_s_best": None,
        "throughput_audio_s_per_s_mb_istft_b32": None,
        "warmup_s": None, "build_s": None, "rows_skipped": [],
    }

    def emit():
        print(json.dumps(result), flush=True)

    t0 = time.time()
    pipeline = build_default_song_synthesizer(tiny=False, n_speakers=1)
    svs = pipeline.synthesizers[0]
    melody = pipeline.melody
    result["build_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    run_song(svs, melody)  # warmup: compiles all buckets
    result["warmup_s"] = round(time.time() - t0, 2)

    # best of 3 timed runs (the tunnel adds ±50-100ms of per-run jitter)
    runs = []
    for _ in range(3):
        t0 = time.time()
        wav_bytes, melody_s, svs_s = run_song(svs, melody)
        runs.append((time.time() - t0, melody_s, svs_s))
    e2e_s, melody_s, svs_s = min(runs)

    import io
    from scipy.io import wavfile
    sr, wav = wavfile.read(io.BytesIO(wav_bytes))
    audio_s = len(wav) / sr

    result.update({
        "value": round(e2e_s, 3),
        "vs_baseline": round(e2e_s / BASELINE_S, 3),
        "audio_seconds": round(audio_s, 2),
        "pipeline_rtf": round(e2e_s / max(audio_s, 1e-6), 4),
        "melody_s": round(melody_s, 3),
        # BASELINE.md tracked metric: beam-decoded note tokens per second
        # (beam 3, on-device prev-sentence conditioning)
        "melody_tokens_per_s": round(
            getattr(run_song, "last_melody_tokens", 0) / max(melody_s, 1e-9),
            1),
        "svs_s": round(svs_s, 3),
    })
    emit()  # the north-star number is now on stdout, whatever happens next

    # Throughput mode: 8 songs (32 sentences) in batched SVS calls of 16 —
    # the serving configuration that actually exercises the chip. (b=16 x
    # 512-frame bucket is the largest full-size fp32 batch that fits v5e
    # HBM; b=32 fp32 needs ~22 G vs 15.75 G, so the serving batcher caps at
    # 16 — config.max_batch_sentences. The bf16-decoder b=32 row below is
    # the monolithic-fit claim, measured.)
    from music_generation_tpu.frontend import midi_to_note as m2n
    N_SONGS = 8
    CHUNK = 16
    scores = []
    for out_lyric, note_tokens, _ in melody.generate_song(SENTENCES):
        names = [m2n(int(m)) if m != "rest" else "rest" for m in note_tokens]
        durations = [SYLLABLE_SECONDS] * (len(out_lyric) - 1) + [0.6]
        scores.append(svs.frontend.align(out_lyric, names, durations))
    big = scores * N_SONGS
    PEAK_BF16 = 1.97e14      # v5e bf16 peak FLOP/s
    PEAK_HBM_BPS = 8.19e11   # v5e HBM bandwidth, ~819 GB/s
    try:
        tp_s, tp_audio_s = timed_throughput(svs, big)
        result["throughput_songs_per_s"] = round(N_SONGS / tp_s, 2)
        result["throughput_audio_s_per_s"] = round(tp_audio_s / tp_s, 1)
        # Device utilization of the batched executable from XLA cost
        # analysis: FLOPs vs bf16 peak AND bytes moved vs HBM bandwidth —
        # the vocoder is bandwidth-bound on v5e (README), so the bytes
        # roofline is the honest one.
        n_chunks = -(-len(big) // CHUNK)  # ceil: exact for partial chunks
        cost = svs.batch_cost_analysis(big[:CHUNK])
        flops = float(cost.get("flops", 0.0)) * n_chunks
        byts = float(cost.get("bytes accessed", 0.0)) * n_chunks
        if flops:
            result["batched_svs_flops"] = flops
            result["mfu_vs_bf16_peak_pct"] = round(
                100.0 * flops / tp_s / PEAK_BF16, 2)
        if byts:
            result["bandwidth_util_pct"] = round(
                100.0 * byts / tp_s / PEAK_HBM_BPS, 2)
    except Exception as e:  # keep the headline metric live no matter what
        print(f"throughput mode failed: {type(e).__name__}", flush=True)
    emit()

    # Fused single-call pipeline (one device round trip for the whole song)
    # with the SAME pinned 0.4 s/syllable workload as the staged number —
    # apples-to-apples.
    def row_fused():
        from music_generation_tpu.pipeline.fused import FusedSongSynthesizer
        fused = FusedSongSynthesizer(melody, pipeline.synthesizers)
        fused.synthesize_song("。".join(SENTENCES),
                              pinned_syllable_seconds=SYLLABLE_SECONDS)
        fused_runs = []
        for _ in range(3):
            t0 = time.time()
            rf = fused.synthesize_song("。".join(SENTENCES),
                                       pinned_syllable_seconds=SYLLABLE_SECONDS)
            fused_runs.append(time.time() - t0)
        sr_f, wav_f = wavfile.read(io.BytesIO(rf.wav_bytes))
        result["fused_e2e_s"] = round(min(fused_runs), 3)
        result["fused_audio_s"] = round(len(wav_f) / sr_f, 2)

    # Streaming TTFA (time-to-first-audio): one decode window instead of the
    # whole song — the streaming endpoint's reason to exist, measured.
    def row_ttfa():
        first = scores[0]
        list(svs.stream_score(first))  # warmup: compiles hidden+window fns
        runs_t = []
        for _ in range(3):
            t0 = time.time()
            gen = svs.stream_score(first)
            next(gen)
            runs_t.append(time.time() - t0)
            for _ in gen:
                pass
        result["ttfa_s"] = round(min(runs_t), 3)

    # Beyond-parity decoder + HBM-cap rows:
    #  - bf16 decoder: halves the dominant byte traffic of the
    #    bandwidth-bound vocoder (SVSConfig.decoder_bf16; parity-bounded by
    #    tests/test_bf16_decoder.py)
    #  - bf16 b=32 (hifigan): bf16 halves the activation bytes, so the
    #    b=32 x 512-frame batch fits HBM *monolithically* (fp32 needs ~22 G
    #    vs 15.75 G). Round-3 presented chunk=128-halo'd decode as the b=32
    #    enabler; at ~512-frame sentences the halo re-decodes 37.5-94% of
    #    frames, so chunking is reserved for streaming/giant inputs.
    #  - mb_istft decoder (models/svs/istft.py): trades the highest-rate
    #    conv stages for an inverse STFT (3.2x fewer FLOPs AND far smaller
    #    activations)
    #  - best: cheapest decoder (mb_istft) + bf16 + biggest batch
    import dataclasses as _dc
    from music_generation_tpu.pipeline.synthesis import SVSSynthesizer
    built = {}  # keep synthesizers alive for param reuse across rows

    def row_bf16():
        bcfg = _dc.replace(svs.cfg, decoder_bf16=True)
        bsvs = SVSSynthesizer(bcfg, params=svs.params, seed=0)
        t, a = timed_throughput(bsvs, big)
        result["throughput_audio_s_per_s_bf16"] = round(a / t, 1)

    def row_bf16_b32():
        b32 = SVSSynthesizer(_dc.replace(svs.cfg, decoder_bf16=True),
                             params=svs.params, seed=0, max_batch=32)
        t, a = timed_throughput(b32, big)
        result["throughput_audio_s_per_s_bf16_b32"] = round(a / t, 1)

    def row_istft_b32():
        icfg = _dc.replace(svs.cfg, decoder_type="mb_istft")
        isvs = SVSSynthesizer(icfg, seed=0, max_batch=32)
        built["istft"] = isvs
        t, a = timed_throughput(isvs, big)
        result["throughput_audio_s_per_s_mb_istft_b32"] = round(a / t, 1)

    def row_best():
        icfg = _dc.replace(svs.cfg, decoder_type="mb_istft",
                           decoder_bf16=True)
        iparams = built["istft"].params if "istft" in built else None
        best = SVSSynthesizer(icfg, params=iparams, seed=0, max_batch=32)
        t, a = timed_throughput(best, big)
        result["throughput_audio_s_per_s_best"] = round(a / t, 1)

    # Priority order: cheap rows (reuse compiled/built programs) first, then
    # the round-4 claims (bf16 / monolithic b=32 / best config), istft last
    # (its BENCH_r03 figure is the least stale). Each row re-emits the JSON
    # line on completion; rows the budget can't cover are skipped loudly.
    rows = [("fused", row_fused, 120.0), ("ttfa", row_ttfa, 180.0),
            ("bf16", row_bf16, ROW_EST_S), ("bf16_b32", row_bf16_b32,
                                            ROW_EST_S),
            ("mb_istft_b32", row_istft_b32, ROW_EST_S),
            ("best", row_best, ROW_EST_S)]
    for name, fn, est in rows:
        remaining = BUDGET_S - (time.time() - T_START)
        if remaining < est:
            print(f"row {name} skipped: {remaining:.0f}s left < {est:.0f}s "
                  "estimate", flush=True)
            result["rows_skipped"].append(name)
            emit()
            continue
        t0 = time.time()
        try:
            fn()
            print(f"row {name}: {time.time() - t0:.1f}s", flush=True)
        except Exception as e:
            print(f"row {name} failed: {type(e).__name__}: {e}", flush=True)
        emit()


if __name__ == "__main__":
    main()
