"""End-to-end song synthesis pipeline (host orchestration around jitted cores).

Parity surface: pipline_inference_svs_v6_multispeaker.py — `Synthesiser.syn`
(:128-144) and `syn_music` (:189-285): sentence chunking on punctuation,
short-fragment merging, per-sentence melody with previous-sentence
conditioning, SVS synthesis, int16 normalize, 0.2 s leading pad, WAV bytes.

TPU-first details:
  - inputs are padded to (phone, frame) shape buckets so each bucket compiles
    once; the jit cache is keyed by bucket.
  - the SVS infer is one XLA program per bucket; only the final trim happens
    on host.
"""

from __future__ import annotations

import bisect
import functools
import re
import threading
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend import ScoreFrontend, midi_to_note
from ..models.melody import (MelodyConfig, MelodyGenerator,
                             lyric_dictionary_from_chars, note_dictionary)
from ..models.svs import SVSConfig, VISinger
from ..audio.wav import (SAMPLE_RATE, concat_with_delay, normalize_int16,
                         write_wav_bytes)

SENTENCE_SPLIT_RE = re.compile(r"[.。，,？；;?!！\n]")
PHONE_BUCKETS = (16, 32, 48, 64, 96, 128)
FRAME_BUCKETS = (128, 256, 512, 768, 1024, 1536, 1984)
MIN_SENTENCE_LEN = 2


# the svs_v5 pipeline string-replaces two phrases in every lyric fragment
# before merging (pipline_inference_svs_v5.py:191; commented out again in
# the v6 pipeline :197) — carried as a variant-gated option
LYRIC_REPLACEMENTS = (("飞向远方去飞翔", "永远陪在你身旁"),
                      ("换你的梦", "呵护着你"))


def split_sentences(lyrics: str, min_len: int = MIN_SENTENCE_LEN,
                    replacements: tuple = ()) -> list[str]:
    """Punctuation split + merge of fragments shorter than min_len
    (parity: syn_music :190-204); ``replacements`` applies per-fragment
    phrase substitutions first (svs_v5's censorship list)."""
    parts = SENTENCE_SPLIT_RE.split(lyrics)
    merged, carry = [], ""
    for p in parts:
        for old, new in replacements:
            p = p.replace(old, new)
        if len(p) < min_len:
            carry += p + ","
        else:
            merged.append(carry + p)
            carry = ""
    return merged


def _bucket(value: int, buckets: tuple[int, ...]) -> int:
    i = bisect.bisect_left(buckets, value)
    if i < len(buckets):
        return buckets[i]
    # beyond the table: round up to a multiple of the largest bucket's stride
    # so rare giant inputs still compile once per size class
    return -(-value // 64) * 64


class SVSSynthesizer:
    """Score -> waveform, one jitted program per shape bucket.

    ``mesh``: optional jax.sharding (data, model) Mesh for multi-chip
    inference — parameters are tensor-parallel over `model` (last-axis rule,
    parallel/mesh.py) and batched calls shard sentences over `data`; XLA
    inserts the ICI collectives. Single-chip behavior is unchanged when
    mesh is None."""

    def __init__(self, cfg: Optional[SVSConfig] = None,
                 params=None, seed: int = 0,
                 frontend: Optional[ScoreFrontend] = None,
                 mesh=None, decode_chunk_frames: Optional[int] = None,
                 decode_chunk_halo: int = 24,
                 max_batch: Optional[int] = None):
        self.cfg = cfg or SVSConfig()
        self.model = VISinger(self.cfg)
        self.frontend = frontend or ScoreFrontend()
        self.mesh = mesh
        # frame-chunked vocoder decode: lax.scan over windows of
        # decode_chunk_frames (+halo each side, center-cropped) bounds the
        # HiFi-GAN upsample activations — the HBM term that capped full-size
        # batches at b=16 (b=32 x 512 frames needs ~22 G vs 15.75 G). The
        # halo must cover the decoder stack's receptive field so chunked
        # output equals the monolithic decode (tests/test_svs.py).
        self.decode_chunk_frames = decode_chunk_frames
        self.decode_chunk_halo = decode_chunk_halo
        # per-instance batch cap: chunked decode bounds the decoder
        # activations, so callers may raise it past the monolithic-decode
        # HBM limit (MAX_BATCH)
        self.max_batch = max_batch if max_batch else self.MAX_BATCH
        self._infer_key = jax.random.PRNGKey(seed + 17)
        if params is None:
            t = PHONE_BUCKETS[0]
            params = self.model.init(
                {"params": jax.random.PRNGKey(seed),
                 "noise": jax.random.PRNGKey(seed + 1)},
                phones=jnp.zeros((1, t), jnp.int32),
                x_lengths=jnp.asarray([t], jnp.int32),
                note_ids=jnp.zeros((1, t), jnp.int32),
                note_durations=jnp.ones((1, t), jnp.float32) * 0.3,
                shengdiao=jnp.zeros((1, t), jnp.int32),
                max_frames=FRAME_BUCKETS[0],
                method=VISinger.infer)
        self.params = params
        if mesh is not None:
            from ..parallel import shard_params
            self.params = shard_params(self.params, mesh)

    @functools.lru_cache(maxsize=32)
    def _compiled(self, max_frames: int):
        def run(params, noise_key, phones, x_lengths, note_ids,
                note_durations, shengdiao):
            return self.model.apply(
                params, phones=phones, x_lengths=x_lengths, note_ids=note_ids,
                note_durations=note_durations, shengdiao=shengdiao,
                max_frames=max_frames, method=VISinger.infer,
                rngs={"noise": noise_key})
        return jax.jit(run)

    def _chunked_decode(self, params, hidden, exc=None):
        """Vocoder decode as a lax.scan over frame windows with halo +
        center crop — trace-time helper used inside the jitted batch
        program. Bit-exact vs the monolithic decode: window starts are
        CLAMPED to the signal (never zero-padded), so the first/last
        windows sit flush with the edges and the decoder's own per-layer
        conv padding applies there exactly as in the monolithic decode,
        while interior crops are exact once the halo covers the decoder
        stack's receptive field (tests/test_svs.py)."""
        chunk, halo = self.decode_chunk_frames, self.decode_chunk_halo
        hop = self.cfg.hop_length
        b, f, c = hidden.shape
        win = chunk + 2 * halo
        if f <= win:
            return self.model.apply(params, hidden, exc=exc,
                                    method=VISinger.decode_hidden)
        n = -(-f // chunk)
        out_starts = jnp.minimum(jnp.arange(n) * chunk, f - chunk)
        win_starts = jnp.clip(out_starts - halo, 0, f - win)
        offsets = out_starts - win_starts

        def step(buf, xs):
            ws, off, outs = xs
            w = jax.lax.dynamic_slice(hidden, (0, ws, 0), (b, win, c))
            # the NSF source is precomputed at FULL length, so windowing it
            # here keeps the phase continuous across chunk boundaries
            e = (None if exc is None else jax.lax.dynamic_slice(
                exc, (0, ws * hop, 0), (b, win * hop, 1)))
            y = self.model.apply(params, w, exc=e,
                                 method=VISinger.decode_hidden)
            piece = jax.lax.dynamic_slice(
                y, (0, off * hop, 0), (b, chunk * hop, y.shape[-1]))
            return jax.lax.dynamic_update_slice(
                buf, piece, (0, outs * hop, 0)), None

        buf = jnp.zeros((b, f * hop, 1), jnp.float32)
        buf, _ = jax.lax.scan(step, buf,
                              (win_starts, offsets, out_starts))
        return buf

    @functools.lru_cache(maxsize=32)
    def _compiled_int16(self, max_frames: int):
        """Infer + on-device per-sentence peak normalize to int16 (the
        reference's 32767/max(0.01, peak) convention) — 4x less data pulled
        back over the host link.

        Takes ONE packed [5, b, t] int32 array (phones / note_ids /
        shengdiao / lengths / bitcast note_durations): on this link each
        device_put costs ~3 ms, so one transfer instead of five shaves
        ~12 ms off every request."""
        hop = self.cfg.hop_length

        def run(params, noise_key, packed):
            phones, note_ids, shengdiao = packed[0], packed[1], packed[2]
            x_lengths = packed[3, :, 0]
            note_durations = jax.lax.bitcast_convert_type(packed[4],
                                                          jnp.float32)
            if self.decode_chunk_frames:
                hidden, mel_len, aux = self.model.apply(
                    params, phones=phones, x_lengths=x_lengths,
                    note_ids=note_ids, note_durations=note_durations,
                    shengdiao=shengdiao, max_frames=max_frames,
                    method=VISinger.infer_hidden, rngs={"noise": noise_key})
                audio = self._chunked_decode(params, hidden,
                                             exc=aux.get("exc"))
            else:
                audio, mel_len, _ = self.model.apply(
                    params, phones=phones, x_lengths=x_lengths,
                    note_ids=note_ids, note_durations=note_durations,
                    shengdiao=shengdiao, max_frames=max_frames,
                    method=VISinger.infer, rngs={"noise": noise_key})
            a = audio[..., 0]
            n_samples = a.shape[1]
            valid = (jnp.arange(n_samples)[None, :]
                     < (mel_len * hop)[:, None]).astype(a.dtype)
            a = a * valid
            peak = jnp.maximum(jnp.abs(a).max(axis=1, keepdims=True), 0.01)
            out = (a * (32767.0 / peak)).astype(jnp.int16)
            # pack int16 pairs as int32: the host link moves int32 ~5x faster
            out = jax.lax.bitcast_convert_type(
                out.reshape(out.shape[0], -1, 2), jnp.int32)
            return out, mel_len
        return jax.jit(run)

    def synthesize(self, text: str, notes: list[str],
                   durations: list[float]) -> np.ndarray:
        """One sentence -> float waveform (un-normalized, trimmed)."""
        return self.synthesize_score(self.frontend.align(text, notes, durations))

    def synthesize_score(self, score) -> np.ndarray:
        pieces = self.split_oversize(score)
        if len(pieces) > 1:
            return np.concatenate([self.synthesize_score(p) for p in pieces])
        t = len(score.phone_ids)
        t_pad = _bucket(t, PHONE_BUCKETS)
        frame_bound = int(np.ceil(score.note_durations.sum()
                                  / self.cfg.frame_seconds)) + t + 8
        # TextPostNet position embeddings cap the frame axis at 2000
        max_frames = min(_bucket(frame_bound, FRAME_BUCKETS), FRAME_BUCKETS[-1])

        def pad(a, fill=0):
            return np.pad(a, (0, t_pad - t), constant_values=fill)

        self._infer_key, sub = jax.random.split(self._infer_key)
        audio, mel_len, _ = self._compiled(max_frames)(
            self.params, sub,
            jnp.asarray(pad(score.phone_ids)[None]),
            jnp.asarray([t], jnp.int32),
            jnp.asarray(pad(score.note_ids)[None]),
            jnp.asarray(pad(score.note_durations)[None]),
            jnp.asarray(pad(score.shengdiao_ids)[None]),
        )
        n_samples = int(mel_len[0]) * self.cfg.hop_length
        return np.asarray(audio[0, :n_samples, 0], dtype=np.float64)

    # fixed streaming gain: the decoder output is tanh-bounded to (-1, 1),
    # so a constant scale is safe; a stream cannot use the per-sentence
    # peak normalization of synthesize_batch (the peak is in the future)
    STREAM_GAIN = 0.95 * 32767.0

    @functools.lru_cache(maxsize=32)
    def _compiled_hidden(self, max_frames: int):
        def run(params, noise_key, phones, x_lengths, note_ids,
                note_durations, shengdiao):
            return self.model.apply(
                params, phones=phones, x_lengths=x_lengths,
                note_ids=note_ids, note_durations=note_durations,
                shengdiao=shengdiao, max_frames=max_frames,
                method=VISinger.infer_hidden, rngs={"noise": noise_key})
        return jax.jit(run)

    @functools.lru_cache(maxsize=8)
    def _compiled_stream_window(self, win: int, has_exc: bool):
        hop = self.cfg.hop_length

        def run(params, hidden, exc, ws):
            b, _, c = hidden.shape
            w = jax.lax.dynamic_slice(hidden, (0, ws, 0), (b, win, c))
            e = (jax.lax.dynamic_slice(exc, (0, ws * hop, 0),
                                       (b, win * hop, 1))
                 if has_exc else None)
            y = self.model.apply(params, w, exc=e,
                                 method=VISinger.decode_hidden)
            return jnp.clip(y[..., 0] * self.STREAM_GAIN,
                            -32768.0, 32767.0).astype(jnp.int16)
        return jax.jit(run)

    def stream_score(self, score, chunk_frames: Optional[int] = None):
        """Yield int16 waveform chunks as the vocoder decodes them.

        Streaming serving: time-to-first-audio is one decode window
        (~chunk_frames*hop/22050 s of audio) instead of the whole sentence.
        Same clamped-window + halo scheme as _chunked_decode, so the
        concatenated stream is sample-identical to a monolithic decode at
        STREAM_GAIN (tests/test_streaming.py). One window is kept in
        flight: window k+1's device compute overlaps pulling window k."""
        pieces = self.split_oversize(score)
        if len(pieces) > 1:
            for p in pieces:
                yield from self.stream_score(p, chunk_frames=chunk_frames)
            return
        chunk = chunk_frames or self.decode_chunk_frames or 64
        halo = self.decode_chunk_halo
        t = len(score.phone_ids)
        t_pad = _bucket(t, PHONE_BUCKETS)
        frame_bound = int(np.ceil(score.note_durations.sum()
                                  / self.cfg.frame_seconds)) + t + 8
        max_frames = min(_bucket(frame_bound, FRAME_BUCKETS),
                         FRAME_BUCKETS[-1])

        def pad(a, fill=0):
            return np.pad(a, (0, t_pad - t), constant_values=fill)

        self._infer_key, sub = jax.random.split(self._infer_key)
        hidden, mel_len, aux = self._compiled_hidden(max_frames)(
            self.params, sub,
            jnp.asarray(pad(score.phone_ids)[None]),
            jnp.asarray([t], jnp.int32),
            jnp.asarray(pad(score.note_ids)[None]),
            jnp.asarray(pad(score.note_durations)[None]),
            jnp.asarray(pad(score.shengdiao_ids)[None]))
        exc = aux.get("exc")
        n = int(mel_len[0])
        hop = self.cfg.hop_length
        f = hidden.shape[1]
        win = min(chunk + 2 * halo, f)
        fn = self._compiled_stream_window(win, exc is not None)
        pending = []
        for out_start in range(0, n, chunk):
            out_frames = min(chunk, n - out_start)
            ws = min(max(out_start - halo, 0), f - win)
            pending.append((fn(self.params, hidden, exc, jnp.int32(ws)),
                            out_start - ws, out_frames))
            if len(pending) > 1:
                y, off, m = pending.pop(0)
                yield np.asarray(y)[0, off * hop: (off + m) * hop]
        for y, off, m in pending:
            yield np.asarray(y)[0, off * hop: (off + m) * hop]

    def _batch_inputs(self, scores: list):
        """(max_frames, packed [5, b, t] int32 array) for one batched SVS
        call — a single device transfer (see _compiled_int16)."""
        t = max(len(s.phone_ids) for s in scores)
        t_pad = _bucket(t, PHONE_BUCKETS)
        frame_bound = max(
            int(np.ceil(s.note_durations.sum() / self.cfg.frame_seconds))
            + len(s.phone_ids) + 8 for s in scores)
        max_frames = min(_bucket(frame_bound, FRAME_BUCKETS), FRAME_BUCKETS[-1])
        b = len(scores)
        b_pad = 1 << (b - 1).bit_length()  # batch bucket: next power of two
        if self.mesh is not None:
            # the data axis must divide the batch so each device gets a
            # whole shard of sentences
            n_data = self.mesh.shape["data"]
            b_pad = -(-b_pad // n_data) * n_data

        packed = np.zeros((5, b_pad, t_pad), np.int32)
        packed[3, :, 0] = 1  # length floor for padding rows
        for i, s in enumerate(scores):
            n = len(s.phone_ids)
            packed[0, i, :n] = s.phone_ids
            packed[1, i, :n] = s.note_ids
            packed[2, i, :n] = s.shengdiao_ids
            packed[3, i, 0] = max(n, 1)
            packed[4, i, :n] = np.asarray(s.note_durations,
                                          np.float32).view(np.int32)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sharding = NamedSharding(self.mesh, P(None, "data"))
            return max_frames, jax.device_put(packed, sharding)
        return max_frames, jnp.asarray(packed)

    # largest full-size sentence batch that fits one v5e's 15.75 G HBM
    # (b=32 x 512-frame HiFi-GAN activations need ~22 G)
    MAX_BATCH = 16

    def _score_frame_bound(self, score) -> int:
        return (int(np.ceil(score.note_durations.sum()
                            / self.cfg.frame_seconds))
                + len(score.phone_ids) + 8)

    def split_oversize(self, score, cap: int = FRAME_BUCKETS[-1]) -> list:
        """Split a score whose frame bound exceeds the TextPostNet position
        table (FRAME_BUCKETS[-1]) into syllable-aligned sub-scores, so a
        500-char unpunctuated request loses zero audio instead of being
        silently clamped. (Reference philosophy: lengths are REPAIRED, not
        failed/truncated — transformer_melody/inference.py:129-157.)"""
        if self._score_frame_bound(score) <= cap:
            return [score]
        t = len(score.phone_ids)
        starts = list(score.syllable_bounds())
        ends = starts[1:] + [t]
        pieces, lo = [], 0
        for s, e in zip(starts, ends):
            if (s > lo
                    and self._score_frame_bound(score.slice_phones(lo, e))
                    > cap):
                pieces.append(score.slice_phones(lo, s))
                lo = s
        pieces.append(score.slice_phones(lo, t))
        import logging
        logging.getLogger("music_generation_tpu").warning(
            "sentence frame bound %d exceeds %d: split into %d sub-scores "
            "at syllable boundaries (no audio dropped)",
            self._score_frame_bound(score), cap, len(pieces))
        return pieces

    def synthesize_batch(self, scores: list) -> list[np.ndarray]:
        """Batch independent sentences into ONE jitted SVS call (the melody
        stage is sequential due to previous-sentence conditioning, but SVS is
        not — batching it turns N launches into one MXU-friendly batch).
        Batches beyond MAX_BATCH sentences split into multiple calls so a
        single 500-char request can't exceed HBM; over-long single sentences
        split at syllable boundaries (split_oversize) and their pieces are
        re-joined, so the per-score output contract is unchanged."""
        if not scores:
            return []
        groups = [self.split_oversize(s) for s in scores]
        if any(len(g) > 1 for g in groups):
            flat = [p for g in groups for p in g]
            wavs = self.synthesize_batch(flat)
            out, k = [], 0
            for g in groups:
                out.append(np.concatenate(wavs[k: k + len(g)])
                           if len(g) > 1 else wavs[k])
                k += len(g)
            return out
        if len(scores) > self.max_batch:
            # dispatch every chunk first, then collect: chunk k+1's host
            # prep + H2D overlaps chunk k's device compute (async dispatch)
            handles = [self.dispatch_batch(scores[k: k + self.max_batch])
                       for k in range(0, len(scores), self.max_batch)]
            out = []
            for h in handles:
                out.extend(self.collect_batch(h))
            return out
        return self.collect_batch(self.dispatch_batch(scores))

    def dispatch_batch(self, scores: list):
        """Launch one batched SVS call without blocking on the result (JAX
        async dispatch): returns an opaque handle for collect_batch. Lets
        callers pipeline H2D/compute/D2H across chunks."""
        max_frames, packed = self._batch_inputs(scores)
        self._infer_key, sub = jax.random.split(self._infer_key)
        audio, mel_len = self._compiled_int16(max_frames)(
            self.params, sub, packed)
        return audio, mel_len, len(scores)

    def collect_batch(self, handle) -> list[np.ndarray]:
        audio, mel_len, b = handle
        # unpack the int32-packed pairs back to int16 samples
        audio = np.asarray(audio).view(np.int16).reshape(audio.shape[0], -1)
        mel_len = np.asarray(mel_len)
        return [audio[i, : int(mel_len[i]) * self.cfg.hop_length]
                for i in range(b)]

    def batch_cost_analysis(self, scores: list) -> dict:
        """XLA cost analysis (flops etc.) of the batched SVS executable for
        these scores — the basis of the bench's utilization metric. Reads
        the analytical cost from the LOWERED module (no backend compile —
        `.compile()` here would not share the jit dispatch cache and costs
        a second multi-minute remote compile on this backend)."""
        max_frames, packed = self._batch_inputs(scores)
        lowered = self._compiled_int16(max_frames).lower(
            self.params, jax.random.PRNGKey(0), packed)

        def _flatten(c):
            if isinstance(c, (list, tuple)):  # some backends wrap in a list
                c = c[0] if c else {}
            return dict(c or {})

        try:
            cost = _flatten(lowered.cost_analysis())
        except Exception:
            cost = {}
        if not cost.get("flops"):
            # some backends (axon) only report cost post-compile; the
            # (remote) compilation cache makes this ~30 s, not minutes
            cost = _flatten(lowered.compile().cost_analysis())
        return cost

    def synthesize_pipe_format(self, line: str) -> np.ndarray:
        metas = line.split("|")
        return self.synthesize(metas[1].replace(" ", ""), metas[2].split(" "),
                               [float(x) for x in metas[3].split(" ")])


@dataclass
class SongResult:
    wav_bytes: bytes
    lyrics_sentences: list[str]
    notes: list[list[str]]
    timings: dict = field(default_factory=dict)


class SongSynthesizer:
    """Full lyrics -> song (multi-speaker via per-speaker SVS params)."""

    def __init__(self, melody: MelodyGenerator,
                 synthesizers: dict[int, SVSSynthesizer],
                 mix_accompaniment: bool = False,
                 accompaniment_gain: float = 0.8,
                 lyric_replacements: tuple = ()):
        self.melody = melody
        # svs_v5 censorship substitutions (LYRIC_REPLACEMENTS when the
        # variant enables them)
        self.lyric_replacements = tuple(lyric_replacements)
        self.synthesizers = synthesizers  # singer_id -> SVSSynthesizer
        # pipeline v1 mixes 0.8*FluidSynth(MIDI) + vocal
        # (pipline_inference.py:221-232); here the melody generator exposes
        # MIDI tracks (telemelody) and audio.render synthesizes them
        self.mix_accompaniment = mix_accompaniment
        self.accompaniment_gain = accompaniment_gain
        # melody decode carries PRNG + prev-sentence state; serialize it so
        # concurrent requests (serve/batching.py) stay race-free while the
        # SVS stage batches across requests
        self._melody_lock = threading.Lock()

    def synthesize_song(self, lyrics: str, singer_id: int = 0,
                        batch_svs: bool = True,
                        svs_batch_fn=None) -> SongResult:
        """``svs_batch_fn(scores) -> wavs`` (when given) replaces the direct
        per-request SVS call — the serving tier passes a cross-request
        coalescer (serve/batching.SVSBatcher.fn_for)."""
        svs = self.synthesizers.get(singer_id, self.synthesizers[0])
        sentences = split_sentences(lyrics,
                                    replacements=self.lyric_replacements)
        all_notes, previous_midis = [], []
        t_start = time.time()

        # Phase 1: melody. One fused device program when the generator
        # supports whole-song generation (on-device prev-sentence
        # conditioning); per-sentence host loop otherwise.
        t0 = time.time()
        scores = []
        sentence_tracks = []
        with self._melody_lock:
            if hasattr(self.melody, "generate_song"):
                outs = self.melody.generate_song(sentences)
            else:
                outs = []
                for k, sentence in enumerate(sentences):
                    out = self.melody.generate(
                        sentence, index=k,
                        previous_notes=previous_midis or None)
                    previous_midis = out[1]
                    outs.append(out)
                    sentence_tracks.append(
                        getattr(self.melody, "last_tracks", None))
        for out_lyric, note_tokens, durations in outs:
            note_names = [midi_to_note(int(m)) if m != "rest" else "rest"
                          for m in note_tokens]
            all_notes.append(note_names)
            scores.append(svs.frontend.align(out_lyric, note_names, durations))
        melody_s = time.time() - t0

        # Phase 2 (parallel): one batched SVS call for all sentences —
        # possibly coalesced with other requests' sentences by the server.
        t0 = time.time()
        if svs_batch_fn is not None:
            wavs = svs_batch_fn(scores)
        elif batch_svs:
            wavs = svs.synthesize_batch(scores)  # int16, normalized on device
        else:
            wavs = [normalize_int16(svs.synthesize_score(s)) for s in scores]
        svs_s = time.time() - t0
        song = concat_with_delay(wavs, delay_seconds=0.2)
        if self.mix_accompaniment and any(t for t in sentence_tracks):
            song = self._mix_accompaniment(song, wavs, sentence_tracks)
        return SongResult(
            wav_bytes=write_wav_bytes(song),
            lyrics_sentences=sentences,
            notes=all_notes,
            timings={"total_s": time.time() - t_start,
                     "melody_s": melody_s, "svs_s": svs_s},
        )

    def stream_song(self, lyrics: str, singer_id: int = 0,
                    sample_rate: int = 22050):
        """Yield int16 chunks of the full song as the vocoder decodes them
        (leading 0.2 s silence pad, matching concat_with_delay). The melody
        stage runs up front — previous-sentence conditioning is inherently
        sequential — then audio streams out one decode window at a time.
        Streaming deviations (documented): fixed STREAM_GAIN instead of
        per-sentence peak normalization, and no accompaniment mixing — a
        stream cannot revisit samples it already emitted."""
        svs = self.synthesizers.get(singer_id, self.synthesizers[0])
        sentences = split_sentences(lyrics,
                                    replacements=self.lyric_replacements)
        with self._melody_lock:
            if hasattr(self.melody, "generate_song"):
                outs = list(self.melody.generate_song(sentences))
            else:
                outs, previous_midis = [], []
                for k, sentence in enumerate(sentences):
                    out = self.melody.generate(
                        sentence, index=k,
                        previous_notes=previous_midis or None)
                    previous_midis = out[1]
                    outs.append(out)
        scores = []
        for out_lyric, note_tokens, durations in outs:
            names = [midi_to_note(int(m)) if m != "rest" else "rest"
                     for m in note_tokens]
            scores.append(svs.frontend.align(out_lyric, names, durations))
        yield np.zeros(int(0.2 * sample_rate), np.int16)
        for score in scores:
            yield from svs.stream_score(score)

    def _mix_accompaniment(self, song, wavs, sentence_tracks,
                           sample_rate: int = 22050):
        """Render each sentence's MIDI tracks at that sentence's vocal
        offset, then mix 0.8*accompaniment + vocal (pipline_inference.py:229)."""
        from ..audio.render import render_tracks
        from ..audio.wav import mix
        total = len(song) / sample_rate
        accomp = np.zeros(len(song), np.float32)
        offset = 0.2  # leading delay pad (concat_with_delay)
        for wav, tracks in zip(wavs, sentence_tracks):
            if tracks:
                # sec_per_tick=0.001 keeps the accompaniment on the SAME
                # clock as the vocal (melody durations are ticks/1000 s,
                # telemelody.py:409) — a tempo-derived tick would drift
                # ~4% per sentence against the singing
                r = render_tracks(tracks, total_seconds=total - offset,
                                  sample_rate=sample_rate, gain=1.0,
                                  sec_per_tick=0.001)
                i0 = int(offset * sample_rate)
                n = min(len(r), len(song) - i0)
                accomp[i0: i0 + n] += r[:n]
            offset += len(np.asarray(wav).ravel()) / sample_rate
        peak = np.abs(accomp).max()
        if peak > 0:
            accomp = accomp / peak * 32767.0
        return mix(accomp, song, self.accompaniment_gain)


def build_default_song_synthesizer(tiny: bool = False, n_speakers: int = 3,
                                   seed: int = 0, fused: bool = False,
                                   mesh=None, svs_nsf: bool = False,
                                   svs_decoder: str = "hifigan",
                                   svs_decoder_bf16: bool = False,
                                   svs_f0_mode: str = "predict",
                                   svs_f0_residual: bool = False):
    """Random-initialized full pipeline (weights are trained separately; the
    reference snapshot ships no usable checkpoints — see
    /root/reference/.MISSING_LARGE_BLOBS)."""
    # Lyric dictionary: cover the full monosyllable charset. Sorted so the
    # mapping matches train.seq's (checkpoints transfer between trainer and
    # serving).
    from ..frontend import load_lexicon
    chars = sorted(load_lexicon().monosyllable.keys())
    lyric_dict = lyric_dictionary_from_chars(chars)
    if tiny:
        mcfg = MelodyConfig(src_vocab=lyric_dict.size, tgt_vocab=37,
                            n_layers=1, d_model=32, d_ff=64, n_heads=2)
        scfg = SVSConfig(inter_channels=16, hidden_channels=16,
                         filter_channels=32, n_heads=2, n_layers=1,
                         spec_channels=65,
                         resblock_kernel_sizes=(3,),
                         resblock_dilation_sizes=((1, 3),),
                         upsample_rates=(8, 8, 2, 2),
                         upsample_initial_channel=32,
                         upsample_kernel_sizes=(16, 16, 4, 4))
    else:
        mcfg = MelodyConfig(src_vocab=lyric_dict.size, tgt_vocab=37)
        scfg = SVSConfig()
    if (svs_nsf or svs_decoder != "hifigan" or svs_decoder_bf16
            or svs_f0_mode != "predict" or svs_f0_residual):
        # serve checkpoints from `train --nsf` / `train --decoder ...`
        # (cfg must match how the params were trained); decoder_bf16 is a
        # pure compute flag (params stay fp32) that halves the
        # bandwidth-bound vocoder's byte traffic; f0_mode is a pure
        # inference choice (SVSConfig.f0_mode — score-pitch control)
        import dataclasses as _dc
        scfg = _dc.replace(scfg, nsf=svs_nsf, decoder_type=svs_decoder,
                           decoder_bf16=svs_decoder_bf16,
                           f0_mode=svs_f0_mode,
                           f0_residual=svs_f0_residual)
    melody = MelodyGenerator(lyric_dict, note_dictionary(), cfg=mcfg,
                             duration_variant="mse", seed=seed)
    synths = {i: SVSSynthesizer(scfg, seed=seed + i, mesh=mesh)
              for i in range(n_speakers)}
    if fused:
        from .fused import FusedSongSynthesizer
        return FusedSongSynthesizer(melody, synths)
    return SongSynthesizer(melody, synths)
