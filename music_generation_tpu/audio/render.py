"""Additive MIDI-to-audio renderer (accompaniment synthesis).

The reference's pipeline v1 renders the TeleMelody MIDI with FluidSynth and a
MuseScore soundfont, then mixes 0.8*accompaniment + vocal
(pipline_inference.py:155,221-232). The soundfont is absent from the
snapshot (.MISSING_LARGE_BLOBS), so this framework ships a small additive
synthesizer instead: per-note harmonic stacks with program-dependent
envelopes (plucked/decaying for piano-class programs, sustained for
strings). Host-side numpy, vectorized over notes in chunks — rendering is
~1e8 madds per song, negligible next to the SVS decode and not worth a
device round-trip over the tunnel.
"""

from __future__ import annotations

import numpy as np

from .midi import Note, Track

SAMPLE_RATE = 22050

# harmonic amplitudes per instrument class. The piano stack carries more
# partials with per-partial decay (struck-string physics below); the string
# stack is a bowed-style ~1/k rolloff rendered as a detuned voice pair.
_PIANO_PARTIALS = (1.0, 0.62, 0.4, 0.26, 0.18, 0.12, 0.08, 0.05)
_STRING_PARTIALS = (1.0, 0.55, 0.38, 0.28, 0.2, 0.14, 0.1)
# piano inharmonicity coefficient: partial k sounds at k*f*sqrt(1 + B*k^2)
# (stiff-string dispersion) — the slight upper-partial stretch is a large
# part of why a real piano doesn't sound like an organ
_PIANO_B = 3e-4
# string section: two voices detuned +/- this many cents, 5.5 Hz vibrato
# fading in over ~0.25 s
_STRING_DETUNE_CENTS = 5.0
_STRING_VIBRATO_HZ = 5.5
_STRING_VIBRATO_CENTS = 18.0


def _is_sustained(program: int) -> bool:
    # GM: 40-55 strings/ensemble, 56-79 brass/reed/pipe, 16-23 organ
    return 16 <= program <= 23 or 40 <= program <= 79


def render_notes(starts: np.ndarray, ends: np.ndarray, pitches: np.ndarray,
                 velocities: np.ndarray, sustained: bool,
                 total_samples: int, sample_rate: int = SAMPLE_RATE,
                 chunk: int = 32) -> np.ndarray:
    """Render (start_s, end_s, midi_pitch, velocity 0..127) note arrays into
    a float waveform."""
    out = np.zeros(total_samples, np.float64)
    if len(starts) == 0:
        return out.astype(np.float32)
    partials = _STRING_PARTIALS if sustained else _PIANO_PARTIALS
    release = 0.05 if sustained else 0.15
    attack = 0.03 if sustained else 0.005
    freqs = 440.0 * 2.0 ** ((np.asarray(pitches, np.float64) - 69.0) / 12.0)
    amps = np.asarray(velocities, np.float64) / 127.0
    for lo in range(0, len(starts), chunk):
        hi = min(lo + chunk, len(starts))
        s = np.asarray(starts[lo:hi], np.float64)
        e = np.asarray(ends[lo:hi], np.float64)
        f = freqs[lo:hi]
        a = amps[lo:hi]
        i0 = np.floor(s * sample_rate).astype(int)
        i1 = np.minimum(np.ceil((e + release) * sample_rate).astype(int),
                        total_samples)
        span = int(max((i1 - i0).max(initial=0), 1))
        # local time grid per note: [n_notes, span]
        t = (np.arange(span)[None, :] / sample_rate)
        note_len = (e - s)[:, None]
        active = t < note_len + release
        # envelope: attack ramp, then sustain or struck decay, then release
        # after note-off; the per-PARTIAL decay/vibrato detail lives in the
        # k loop below
        env = np.minimum(t / attack, 1.0)
        env = env * np.where(t < note_len, 1.0,
                             np.maximum(1.0 - (t - note_len) / release, 0.0))
        wave = np.zeros_like(t * f[:, None])
        if sustained:
            # bowed-string section: two voices detuned +/- a few cents with
            # a shared vibrato that fades in — the beating + pitch motion is
            # what reads as "strings" rather than "sine organ"
            det = 2.0 ** (_STRING_DETUNE_CENTS / 1200.0)
            vib = (_STRING_VIBRATO_CENTS / 1200.0 * np.log(2.0)
                   * np.minimum(t / 0.25, 1.0)
                   * np.sin(2 * np.pi * _STRING_VIBRATO_HZ * t))
            for k, pk in enumerate(partials, start=1):
                ph = 2 * np.pi * f[:, None] * k * t * (1.0 + vib)
                wave += pk * 0.5 * (np.sin(ph * det) + np.sin(ph / det))
        else:
            # struck string (piano-class): inharmonically stretched partials
            # (stiff-string dispersion), higher partials decaying faster —
            # the attack is bright, the tail darkens like a real hammer note
            tau = np.maximum(note_len, 0.3)
            for k, pk in enumerate(partials, start=1):
                stretch = k * np.sqrt(1.0 + _PIANO_B * k * k)
                decay = np.exp(-(1.2 + 0.55 * k) * t / tau)
                wave += pk * decay * np.sin(
                    2 * np.pi * f[:, None] * stretch * t)
        wave *= env * active * a[:, None]
        for j in range(hi - lo):
            n = min(span, total_samples - i0[j])
            if n > 0:
                out[i0[j]: i0[j] + n] += wave[j, :n]
    return out.astype(np.float32)


def render_tracks(tracks: list, tempo_bpm: float = 120.0,
                  ticks_per_beat: int = 480,
                  sample_rate: int = SAMPLE_RATE,
                  total_seconds: float | None = None,
                  tick_offset: int = 0,
                  gain: float = 0.2,
                  sec_per_tick: float | None = None) -> np.ndarray:
    """Render MIDI tracks (audio/midi.py Track/Note) to a mono waveform.

    ``sec_per_tick`` overrides the tempo-derived tick length — the song
    pipeline passes 0.001 so the accompaniment shares the vocal's clock
    (TeleMelody note durations are read back as ticks/1000 seconds,
    telemelody.py:409)."""
    if sec_per_tick is None:
        sec_per_tick = 60.0 / tempo_bpm / ticks_per_beat
    end_s = 0.0
    for tr in tracks:
        for n in tr.notes:
            end_s = max(end_s, (n.end + tick_offset) * sec_per_tick)
    total = total_seconds if total_seconds is not None else end_s + 0.3
    total_samples = int(round(total * sample_rate))
    out = np.zeros(total_samples, np.float32)
    for tr in tracks:
        if not tr.notes:
            continue
        starts = np.asarray([(n.start + tick_offset) * sec_per_tick
                             for n in tr.notes])
        ends = np.asarray([(n.end + tick_offset) * sec_per_tick
                           for n in tr.notes])
        pitches = np.asarray([n.pitch for n in tr.notes])
        vels = np.asarray([min(max(n.velocity, 1), 127) for n in tr.notes])
        out += render_notes(starts, ends, pitches, vels,
                            _is_sustained(tr.program), total_samples,
                            sample_rate)
    peak = np.abs(out).max()
    if peak > 0:
        out = out / peak
    return (gain * out).astype(np.float32)
