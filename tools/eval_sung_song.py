"""Does a trained checkpoint SING THE RIGHT NOTES, end to end?

Copy-synthesis (tools/eval_copy_synthesis.py) reconstructs from the
ground-truth spectrogram, so it proves the posterior/decoder but not the
text-to-audio path a served request actually takes. This probe drives the
FULL inference chain the serving pipeline uses — score -> TextEncoder ->
duration predictor -> LengthRegulator -> F0 predictor -> flow -> vocoder
(predicted-F0 NSF excitation when --nsf) — and then YIN-tracks the output
against the score's note pitches (reference intent: the whole service exists
to sing a melody, pipline_inference_svs_v6_multispeaker.py:189-285).

Reported per note (edge frames dropped): median-F0 error in semitones, the
fraction of notes within +-0.5 semitone ("in tune"), and frame-level RMSE.

Usage:
  python tools/eval_sung_song.py --ckpt /root/runs/gan_nsf/step_8000 \
      --data-dir /root/runs/toy/npy --nsf [--out artifacts/sung_song.json] \
      [--wav-out artifacts/sung_song.wav]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="trainer step_N directory")
    p.add_argument("--data-dir", required=True,
                   help="npy dataset dir (shapes the restore target)")
    p.add_argument("--nsf", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--out", default=None)
    p.add_argument("--wav-out", default=None)
    args = p.parse_args()

    import dataclasses as _dc

    import jax.numpy as jnp
    import numpy as np

    from music_generation_tpu.audio.f0 import yin_f0
    from music_generation_tpu.models.svs import SVSConfig
    from music_generation_tpu.pipeline.synthesis import SVSSynthesizer
    from music_generation_tpu.train import (TrainConfig, create_states,
                                            restore_checkpoint)
    from music_generation_tpu.train.dataset import NpyDataset

    cfg = SVSConfig() if not args.tiny else SVSConfig(
        inter_channels=16, hidden_channels=16, filter_channels=32,
        n_heads=2, n_layers=1, spec_channels=65,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        upsample_rates=(4, 4), upsample_initial_channel=32,
        upsample_kernel_sizes=(8, 8), segment_size=16 * 8, hop_length=16)
    if args.nsf:
        cfg = _dc.replace(cfg, nsf=True)
    t_phones, t_frames = (8, 32) if args.tiny else (64, 480)

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
    wavs = svs.synthesize_batch(scores)

    frame_s = cfg.hop_length / cfg.sampling_rate
    note_errs, frame_errs = [], []
    in_tune = 0
    n_notes = 0
    for (text, notes), wav in zip(SONG, wavs):
        wav = np.asarray(wav, np.float32)
        if wav.dtype == np.int16 or np.abs(wav).max() > 2.0:
            wav = wav / 32767.0
        f0 = yin_f0(wav, sample_rate=cfg.sampling_rate, hop=cfg.hop_length)
        frames_per_note = int(round(SYLLABLE_SECONDS / frame_s))
        for k, note in enumerate(notes):
            seg = f0[k * frames_per_note: (k + 1) * frames_per_note]
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
        "n_notes": n_notes,
        "n_tracked_notes": int(len(valid)),
        "note_median_rmse_semitones":
            round(float(np.sqrt(np.mean(valid ** 2))), 3) if len(valid)
            else None,
        "frac_notes_within_half_semitone": round(in_tune / max(n_notes, 1), 3),
        "frame_f0_rmse_semitones":
            round(float(np.sqrt(np.mean(np.asarray(frame_errs) ** 2))), 3)
            if frame_errs else None,
        "note": "full inference chain (predicted durations/F0), not "
                "copy-synthesis; edge frames dropped per note",
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
        song = concat_with_delay([np.asarray(w) for w in wavs], 0.2)
        write_wav(args.wav_out, normalize_int16(song), cfg.sampling_rate)


if __name__ == "__main__":
    main()
