"""Does a trained checkpoint SING THE RIGHT NOTES, end to end?

Copy-synthesis (tools/eval_copy_synthesis.py) reconstructs from the
ground-truth spectrogram, so it proves the posterior/decoder but not the
text-to-audio path a served request actually takes. This probe drives the
FULL inference chain the serving pipeline uses — score -> TextEncoder ->
duration predictor -> LengthRegulator -> F0 predictor -> flow -> vocoder
(predicted-F0 NSF excitation when --nsf) — and then YIN-tracks the output
against the score's note pitches (reference intent: the whole service exists
to sing a melody, pipline_inference_svs_v6_multispeaker.py:189-285).

Note windows are NOT assumed to land at k*0.4 s: the duration predictor is
free-running (per-phone sigmoid frac * note_duration, visinger.py:358-360),
so boundaries drift; windows are rescaled by the sentence's actual/expected
length. `--pinned` instead pins per-phone frames from the score (ph_dur),
which makes boundaries exact and isolates pitch accuracy from duration error.

Reported per note (edge frames dropped): median-F0 error in semitones, the
fraction of notes within +-0.5 semitone ("in tune"), and frame-level RMSE.

Usage:
  python tools/eval_sung_song.py --ckpt /root/runs/gan_nsf/step_8000 \
      --data-dir /root/runs/toy/npy --nsf [--pinned] \
      [--out artifacts/sung_song.json] [--wav-out artifacts/sung_song.wav]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# a deterministic 4-sentence song over the toy corpus' syllables and
# pentatonic notes (train/toydata.py _TOY_SYLLABLES/_TOY_NOTES)
SONG = [
    ("你好世界天地", ["C4", "D4", "E4", "G4", "A4", "G4"]),
    ("天地人和你好", ["E4", "G4", "A4", "A4", "G4", "E4"]),
    ("世界人和天地", ["A4", "G4", "E4", "D4", "C4", "D4"]),
    ("你好天地世界", ["C4", "E4", "G4", "C4", "D4", "C4"]),
]
SYLLABLE_SECONDS = 0.4
NOTE_HZ = {"C4": 261.63, "D4": 293.66, "E4": 329.63, "G4": 392.0,
           "A4": 440.0}


def _pinned_wavs(svs, scores, texts, frames_per_note):
    """Synthesize with per-phone frames pinned from the score (ph_dur):
    note k occupies exactly frames [k*fpn, (k+1)*fpn). A syllable's frames
    are split evenly across its phones via the frontend's phone->syllable
    map (align_template)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from music_generation_tpu.models.svs.visinger import VISinger
    from music_generation_tpu.pipeline.synthesis import (FRAME_BUCKETS,
                                                         PHONE_BUCKETS,
                                                         _bucket)

    @jax.jit
    def run(params, key, phones, x_lengths, note_ids, note_durations,
            shengdiao, ph_dur):
        return svs.model.apply(
            params, phones=phones, x_lengths=x_lengths, note_ids=note_ids,
            note_durations=note_durations, shengdiao=shengdiao,
            max_frames=max_frames, ph_dur=ph_dur, method=VISinger.infer,
            rngs={"noise": key})

    # one shared padded shape => one compile for the whole song
    t_pad = _bucket(max(len(s.phone_ids) for s in scores), PHONE_BUCKETS)
    n_notes = max(len(n) for _, n in SONG)
    max_frames = _bucket(n_notes * frames_per_note + 8, FRAME_BUCKETS)

    wavs = []
    key = jax.random.PRNGKey(0)
    for (text, _), score in zip(texts, scores):
        _, _, syl_idx, n_syl = svs.frontend.align_template(text)
        counts = np.bincount(syl_idx, minlength=n_syl)
        ph_dur = np.zeros(len(syl_idx), np.int32)
        pos = 0
        for s in range(n_syl):
            c = int(counts[s])
            base, rem = divmod(frames_per_note, c)
            for j in range(c):
                ph_dur[pos + j] = base + (1 if j < rem else 0)
            pos += c
        t = len(score.phone_ids)
        assert t == len(ph_dur), (t, len(ph_dur))

        def pad(a, fill=0):
            return np.pad(a, (0, t_pad - t), constant_values=fill)

        key, sub = jax.random.split(key)
        audio, mel_len, _ = run(
            svs.params, sub,
            jnp.asarray(pad(score.phone_ids)[None]),
            jnp.asarray([t], jnp.int32),
            jnp.asarray(pad(score.note_ids)[None]),
            jnp.asarray(pad(score.note_durations)[None]),
            jnp.asarray(pad(score.shengdiao_ids)[None]),
            jnp.asarray(pad(ph_dur)[None]))
        n_samples = int(mel_len[0]) * svs.cfg.hop_length
        wavs.append(np.asarray(audio[0, :n_samples, 0], np.float32))
    return wavs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="trainer step_N directory")
    p.add_argument("--data-dir", required=True,
                   help="npy dataset dir (shapes the restore target)")
    p.add_argument("--nsf", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--decoder", default="hifigan",
                   choices=("hifigan", "istft", "mb_istft"),
                   help="must match the trainer's --decoder")
    p.add_argument("--pinned", action="store_true",
                   help="pin per-phone frames from the score (exact note "
                        "windows; isolates pitch from duration error)")
    p.add_argument("--f0", default="predict", choices=("predict", "score"),
                   help="inference F0 source (SVSConfig.f0_mode): 'score' "
                        "derives frame F0 from the MIDI notes instead of "
                        "the F0Predictor")
    p.add_argument("--out", default=None)
    p.add_argument("--wav-out", default=None)
    args = p.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from music_generation_tpu.audio.f0 import yin_f0
    from music_generation_tpu.pipeline.synthesis import SVSSynthesizer
    from music_generation_tpu.train import (TrainConfig, build_svs_config,
                                            create_states, restore_checkpoint,
                                            tool_shapes)
    from music_generation_tpu.train.dataset import NpyDataset

    try:
        cfg = build_svs_config(tiny=args.tiny, decoder=args.decoder,
                               nsf=args.nsf)
    except ValueError as e:
        p.error(str(e))
    if args.f0 != "predict":
        import dataclasses as _dc
        # pure inference choice; the param tree (F0Predictor included) is
        # unchanged, so the restore target still matches the trainer's
        cfg = _dc.replace(cfg, f0_mode=args.f0)
    t_phones, t_frames = tool_shapes(args.tiny)

    ds = NpyDataset(args.data_dir, cfg, t_phones=t_phones, t_frames=t_frames)
    batch = {k: jnp.asarray(v) for k, v in ds.batch(2).items()}
    gen_state, disc_state, _, _ = create_states(cfg, TrainConfig(), batch)
    gen_state, _ = restore_checkpoint(os.path.abspath(args.ckpt), gen_state,
                                      disc_state)

    # SVSSynthesizer.params is the full variables dict; the trainer state
    # holds the inner tree (flax TrainState convention)
    svs = SVSSynthesizer(cfg, params={"params": gen_state.params}, seed=0)
    scores = [svs.frontend.align(text, notes,
                                 [SYLLABLE_SECONDS] * len(notes))
              for text, notes in SONG]
    frame_s = cfg.hop_length / cfg.sampling_rate
    frames_per_note = int(round(SYLLABLE_SECONDS / frame_s))
    if args.pinned:
        wavs = _pinned_wavs(svs, scores, SONG, frames_per_note)
    else:
        wavs = svs.synthesize_batch(scores)

    note_errs, frame_errs = [], []
    in_tune = 0
    n_notes = 0
    for (text, notes), wav in zip(SONG, wavs):
        orig = np.asarray(wav)
        wav = orig.astype(np.float32)
        if orig.dtype == np.int16 or np.abs(wav).max() > 2.0:
            wav = wav / 32767.0
        f0 = yin_f0(wav, sample_rate=cfg.sampling_rate, hop=cfg.hop_length)
        # predicted durations drift from the k*0.4s grid (free-running
        # duration predictor) — rescale the note grid to the sentence's
        # actual length so late notes score against the right target
        expected = len(notes) * frames_per_note
        scale = 1.0 if args.pinned else len(f0) / max(expected, 1)
        for k, note in enumerate(notes):
            lo = int(round(k * frames_per_note * scale))
            hi = int(round((k + 1) * frames_per_note * scale))
            seg = f0[lo:hi]
            seg = seg[3:-3]  # drop attack/decay edges
            voiced = seg[seg > 0]
            n_notes += 1
            if len(voiced) < 4:
                note_errs.append(float("nan"))
                continue
            err = 12.0 * np.log2(np.median(voiced) / NOTE_HZ[note])
            note_errs.append(float(err))
            if abs(err) <= 0.5:
                in_tune += 1
            frame_errs.extend(
                (12.0 * np.log2(voiced / NOTE_HZ[note])).tolist())

    valid = np.asarray([e for e in note_errs if np.isfinite(e)])
    result = {
        "ckpt": args.ckpt,
        "pinned_durations": bool(args.pinned),
        "f0_mode": args.f0,
        "n_notes": n_notes,
        "n_tracked_notes": int(len(valid)),
        "note_median_rmse_semitones":
            round(float(np.sqrt(np.mean(valid ** 2))), 3) if len(valid)
            else None,
        "frac_notes_within_half_semitone": round(in_tune / max(n_notes, 1), 3),
        "frame_f0_rmse_semitones":
            round(float(np.sqrt(np.mean(np.asarray(frame_errs) ** 2))), 3)
            if frame_errs else None,
        "note": "full inference chain, not copy-synthesis; edge frames "
                "dropped per note; windows rescaled by actual/expected "
                "length unless pinned",
    }
    print(json.dumps(result))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    if args.wav_out:
        from music_generation_tpu.audio.wav import (concat_with_delay,
                                                    normalize_int16,
                                                    write_wav)
        song = concat_with_delay([np.asarray(w, np.float32) for w in wavs],
                                 0.2)
        write_wav(args.wav_out, normalize_int16(song), cfg.sampling_rate)


if __name__ == "__main__":
    main()
