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
so boundaries drift; each note is scored over the EXACT frames the model
gave its phones (aux['frames'] from infer), so duration drift never smears
a note into its neighbour's window. `--pinned` additionally pins per-phone
frames from the score (ph_dur), isolating pitch accuracy from duration error.

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


def _synth_with_bounds(svs, scores, texts, frames_per_note, pinned):
    """Synthesize each sentence via VISinger.infer (the same program the
    serving pipeline jits) and return (wavs, note_bounds) where
    note_bounds[i] is the list of (lo, hi) frame windows of sentence i's
    notes, taken from the EXACT per-phone frame counts the model used
    (aux['frames']) — not a k*fpn grid assumption. With pinned=True the
    per-phone frames are pinned from the score (ph_dur): note k occupies
    exactly frames [k*fpn, (k+1)*fpn); a syllable's frames are split evenly
    across its phones via the frontend's phone->syllable map
    (align_template). With pinned=False the duration predictor free-runs
    and the windows follow its actual output, so pitch is scored against
    the note the model is actually singing at each frame."""
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

    wavs, note_bounds = [], []
    key = jax.random.PRNGKey(0)
    for (text, _), score in zip(texts, scores):
        _, _, syl_idx, n_syl = svs.frontend.align_template(text)
        counts = np.bincount(syl_idx, minlength=n_syl)
        t = len(score.phone_ids)
        if pinned:
            ph_dur = np.zeros(len(syl_idx), np.int32)
            pos = 0
            for s in range(n_syl):
                c = int(counts[s])
                base, rem = divmod(frames_per_note, c)
                for j in range(c):
                    ph_dur[pos + j] = base + (1 if j < rem else 0)
                pos += c
            assert t == len(ph_dur), (t, len(ph_dur))
        else:
            ph_dur = None

        def pad(a, fill=0):
            return np.pad(a, (0, t_pad - t), constant_values=fill)

        key, sub = jax.random.split(key)
        audio, mel_len, aux = run(
            svs.params, sub,
            jnp.asarray(pad(score.phone_ids)[None]),
            jnp.asarray([t], jnp.int32),
            jnp.asarray(pad(score.note_ids)[None]),
            jnp.asarray(pad(score.note_durations)[None]),
            jnp.asarray(pad(score.shengdiao_ids)[None]),
            None if ph_dur is None else jnp.asarray(pad(ph_dur)[None]))
        n_frames = int(mel_len[0])
        wavs.append(np.asarray(audio[0, :n_frames * svs.cfg.hop_length, 0],
                               np.float32))
        # exact frame window of each note = the frames the model gave the
        # note's phones (aux['frames'] is the post-mask per-phone counts)
        frames_ph = np.asarray(aux["frames"])[0, :t]
        bounds, pos = [], 0
        for s in range(n_syl):
            width = int(frames_ph[syl_idx == s].sum())
            bounds.append((min(pos, n_frames), min(pos + width, n_frames)))
            pos += width
        note_bounds.append(bounds)
    return wavs, note_bounds


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
    p.add_argument("--sweep", action="store_true",
                   help="evaluate ALL four (pinned x f0_mode) combos in one "
                        "process (one restore, shared startup); --out then "
                        "holds a list and --wav-out the free-running "
                        "predict-mode song")
    p.add_argument("--f0-residual", action="store_true",
                   help="checkpoint was trained with --f0-residual "
                        "(SVSConfig.f0_residual; same param tree, but "
                        "inference must add the note-lf0 base)")
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
                               nsf=args.nsf, f0_residual=args.f0_residual)
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

    import dataclasses as _dc

    def score_wavs(wavs, bounds):
        note_errs, frame_errs = [], []
        in_tune = 0
        n_notes = 0
        for (text, notes), wav, sent_bounds in zip(SONG, wavs, bounds):
            orig = np.asarray(wav)
            wav = orig.astype(np.float32)
            if orig.dtype == np.int16 or np.abs(wav).max() > 2.0:
                wav = wav / 32767.0
            f0 = yin_f0(wav, sample_rate=cfg.sampling_rate,
                        hop=cfg.hop_length)
            # note windows come from the model's OWN per-phone frame counts
            # (aux['frames']), so free-running duration drift cannot smear a
            # note's frames into its neighbour's scoring window
            for (lo, hi), note in zip(sent_bounds, notes):
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
        return {
            "n_notes": n_notes,
            "n_tracked_notes": int(len(valid)),
            "note_rmse_semitones":
                round(float(np.sqrt(np.mean(valid ** 2))), 3) if len(valid)
                else None,
            "note_bias_semitones":
                round(float(np.mean(valid)), 3) if len(valid) else None,
            "frac_notes_within_half_semitone":
                round(in_tune / max(n_notes, 1), 3),
            "frame_f0_rmse_semitones":
                round(float(np.sqrt(np.mean(np.asarray(frame_errs) ** 2))), 3)
                if frame_errs else None,
        }

    combos = ([(False, "predict"), (True, "predict"),
               (False, "score"), (True, "score")] if args.sweep
              else [(args.pinned, args.f0)])
    results = []
    wav_keep = None
    params = {"params": gen_state.params}
    frames_per_note = int(round(SYLLABLE_SECONDS * cfg.sampling_rate
                                / cfg.hop_length))
    for pinned, f0m in combos:
        cfg_m = _dc.replace(cfg, f0_mode=f0m)
        # params transfer freely across f0_mode (identical tree)
        svs = SVSSynthesizer(cfg_m, params=params, seed=0)
        scores = [svs.frontend.align(text, notes,
                                     [SYLLABLE_SECONDS] * len(notes))
                  for text, notes in SONG]
        wavs, bounds = _synth_with_bounds(svs, scores, SONG, frames_per_note,
                                          pinned=pinned)
        if wav_keep is None:
            wav_keep = wavs
        result = {
            "ckpt": args.ckpt,
            "pinned_durations": bool(pinned),
            "f0_mode": f0m,
            **score_wavs(wavs, bounds),
            "note": "full inference chain, not copy-synthesis; edge frames "
                    "dropped per note; note windows follow the model's own "
                    "per-phone frame counts (aux['frames'])",
        }
        print(json.dumps(result))
        results.append(result)

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results if args.sweep else results[0], f, indent=1)
    if args.wav_out:
        from music_generation_tpu.audio.wav import (concat_with_delay,
                                                    normalize_int16,
                                                    write_wav)
        song = concat_with_delay([np.asarray(w, np.float32)
                                  for w in wav_keep], 0.2)
        write_wav(args.wav_out, normalize_int16(song), cfg.sampling_rate)


if __name__ == "__main__":
    main()
