"""Copy-synthesis quality evaluation for a trained VISinger checkpoint.

Loads a train checkpoint, runs infer_fake (spectrogram -> posterior ->
waveform) on dataset utterances, and reports mel-L1 between the
reconstruction and the ground-truth audio — for the trained params and for
random-init params, so the improvement from training is explicit.
(VERDICT round-1 'training realism': audio-quality evidence, not just loss
curves.)

Usage:
  python tools/eval_copy_synthesis.py --ckpt ckpts/step_400 \
      --data-dir toyset/npy [--tiny] [--n 4] [--out artifacts/eval.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, nargs="+",
                   help="one or more trainer step_N dirs; all share one jit "
                        "program (the compile dominates, restores are cheap)."
                        " --wav-out/--dump apply to the FIRST; --out holds a"
                        " list when several are given")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--out", default=None)
    p.add_argument("--dump", default=None,
                   help="save raw (unnormalized) rec/ref audio arrays to "
                        "this .npz for offline error analysis")
    p.add_argument("--wav-out", default=None,
                   help="write the first reconstruction as a wav here")
    p.add_argument("--nsf", action="store_true",
                   help="checkpoint was trained with --nsf (harmonic "
                        "excitation decoder; GT log-f0 drives the source)")
    p.add_argument("--noise-scale", type=float, default=1.0,
                   help="posterior sampling noise scale (0 = reconstruct "
                        "from the posterior MEAN, isolating the decoder's "
                        "fidelity from the VAE sampling-noise floor)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from music_generation_tpu.audio.stft import mel_spectrogram
    from music_generation_tpu.models.svs import SVSConfig, VISinger
    from music_generation_tpu.train import (TrainConfig, create_states,
                                            restore_checkpoint)
    from music_generation_tpu.train.dataset import NpyDataset

    if args.tiny:
        cfg = SVSConfig(
            inter_channels=16, hidden_channels=16, filter_channels=32,
            n_heads=2, n_layers=1, spec_channels=65,
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
            upsample_rates=(4, 4), upsample_initial_channel=32,
            upsample_kernel_sizes=(8, 8), segment_size=16 * 8, hop_length=16)
        t_phones, t_frames = 8, 32
    else:
        cfg = SVSConfig()
        t_phones, t_frames = 64, 480
    if args.nsf:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, nsf=True)

    ds = NpyDataset(args.data_dir, cfg, t_phones=t_phones, t_frames=t_frames)
    batch = {k: jnp.asarray(v) for k, v in ds.batch(args.n).items()}
    gen_state, disc_state, gen, _ = create_states(cfg, TrainConfig(), batch)
    random_params = gen_state.params

    @jax.jit
    def reconstruct(params, spec, y_lengths, log_f0, noise_key):
        ns = args.noise_scale
        noise = (None if ns == 1.0 else
                 jax.random.normal(noise_key,
                                   (spec.shape[0], spec.shape[1],
                                    cfg.inter_channels)) * ns)
        audio, y_mask, _ = gen.apply(
            {"params": params}, spec, y_lengths, noise=noise,
            log_f0=log_f0 if cfg.nsf else None,
            method=VISinger.copy_synthesis, rngs={"noise": noise_key})
        return audio

    y_len = np.asarray(batch["y_lengths"])

    def mel_l1(params):
        audio = reconstruct(params, batch["spec"], batch["y_lengths"],
                            batch["log_f0"], jax.random.PRNGKey(0))
        rec = np.asarray(audio)[..., 0]
        ref = np.asarray(batch["audio"])[..., 0][:, : rec.shape[1]]
        mel_rec = np.asarray(mel_spectrogram(
            jnp.asarray(rec), cfg.sampling_rate, hop=cfg.hop_length))
        mel_ref = np.asarray(mel_spectrogram(
            jnp.asarray(ref), cfg.sampling_rate, hop=cfg.hop_length))
        # only the valid (unpadded) frames of each utterance count
        total, n = 0.0, 0
        for i in range(mel_rec.shape[0]):
            f = min(int(y_len[i]), mel_rec.shape[1])
            total += float(np.abs(mel_rec[i, :f] - mel_ref[i, :f]).sum())
            n += f * mel_rec.shape[-1]
        # "audible" variant: clamp both log-mels at log(1e-2) (~ -40 dB)
        # before differencing. The toy targets are synthetically clean
        # harmonic stacks, so a large share of raw mel-L1 is the GAN's
        # inaudible noise floor vs the target's digital silence; clamping
        # reports the error on content a listener can hear.
        lo = float(np.log(1e-2))
        total_f, n_f = 0.0, 0
        for i in range(mel_rec.shape[0]):
            f = min(int(y_len[i]), mel_rec.shape[1])
            total_f += float(np.abs(np.maximum(mel_rec[i, :f], lo)
                                    - np.maximum(mel_ref[i, :f], lo)).sum())
            n_f += f * mel_rec.shape[-1]
        return total / max(n, 1), rec, total_f / max(n_f, 1)

    random_l1, _, _ = mel_l1(random_params)

    # F0-tracking probe: YIN pitch of the reconstruction vs the target
    # audio's own YIN track over voiced frames — does the trained vocoder
    # actually sing the right pitch? Reported in semitones RMSE.
    from music_generation_tpu.audio.f0 import yin_f0

    def f0_rmse_semitones(rec_audio):
        errs = []
        ref = np.asarray(batch["audio"])[..., 0]
        for i in range(rec_audio.shape[0]):
            n = min(int(y_len[i]) * cfg.hop_length, rec_audio.shape[1])
            f_rec = yin_f0(np.asarray(rec_audio[i, :n], np.float32),
                           sample_rate=cfg.sampling_rate, hop=cfg.hop_length)
            f_ref = yin_f0(np.asarray(ref[i, :n], np.float32),
                           sample_rate=cfg.sampling_rate, hop=cfg.hop_length)
            m = min(len(f_rec), len(f_ref))
            voiced = (f_rec[:m] > 0) & (f_ref[:m] > 0)
            if voiced.sum() > 4:
                d = 12.0 * np.log2(f_rec[:m][voiced] / f_ref[:m][voiced])
                errs.append(float(np.sqrt(np.mean(d ** 2))))
        return round(float(np.mean(errs)), 3) if errs else None

    results = []
    for k, ckpt in enumerate(args.ckpt):
        state_k, _ = restore_checkpoint(os.path.abspath(ckpt), gen_state,
                                        disc_state)
        delta = sum(float(np.abs(a - b).sum()) for a, b in zip(
            jax.tree_util.tree_leaves(state_k.params),
            jax.tree_util.tree_leaves(random_params)))
        print(f"{ckpt}: restored param L1 delta vs random init: {delta:.3e}")
        trained_l1, rec, trained_l1_floored = mel_l1(state_k.params)
        trained_f0 = f0_rmse_semitones(rec)
        # tanh-saturation telemetry: the decoder death state (DC rail +
        # ripple) can still score deceptively well on YIN-F0 and log-mel
        # metrics, so report it explicitly (healthy: |dc| ~0, sat_frac ~0,
        # rms ratio ~1)
        ref_np = np.asarray(batch["audio"])[..., 0][:, : rec.shape[1]]
        sat = {"audio_dc": round(float(rec.mean()), 4),
               "audio_sat_frac": round(float((np.abs(rec) > 0.95).mean()), 4),
               "rms_ratio_rec_vs_ref": round(
                   float(np.sqrt((rec ** 2).mean()) /
                         max(np.sqrt((ref_np ** 2).mean()), 1e-9)), 3)}
        # explicit verdict so a railed decoder can't hide behind good-looking
        # mel/F0 numbers in a committed artifact
        sat["dc_railed"] = bool(abs(sat["audio_dc"]) > 0.5
                                or sat["audio_sat_frac"] > 0.5)
        # loudness verdict: reconstructions must land within ~2 dB of the
        # target's RMS (0.8..1.25) — round 4 silently shipped a -6 dB
        # (ratio 0.505) checkpoint; TrainConfig.c_energy now trains this
        # closed and the eval flags any regression.
        sat["rms_in_band"] = bool(0.8 < sat["rms_ratio_rec_vs_ref"] < 1.25)
        if sat["dc_railed"]:
            print("WARNING: reconstruction is DC-railed/saturated — the "
                  "mel-L1 and F0 numbers below are NOT valid quality "
                  "evidence", file=sys.stderr)
        if not sat["rms_in_band"]:
            print(f"WARNING: reconstruction loudness is off-target "
                  f"(rms_ratio {sat['rms_ratio_rec_vs_ref']}, band "
                  f"0.8-1.25) — quality numbers describe an audibly "
                  f"mis-leveled output", file=sys.stderr)
        result = {"ckpt": ckpt, "n_utts": args.n,
                  "mel_l1_trained": round(trained_l1, 4),
                  "mel_l1_audible_trained": round(trained_l1_floored, 4),
                  "mel_l1_random_init": round(random_l1, 4),
                  "improvement_x": round(random_l1 / max(trained_l1, 1e-9),
                                         2),
                  "f0_rmse_semitones_trained": trained_f0, **sat}
        print(json.dumps(result))
        results.append(result)
        if k > 0:
            continue  # wav/dump artifacts come from the first ckpt
        if args.dump:
            np.savez(args.dump, rec=rec,
                     ref=np.asarray(batch["audio"])[..., 0],
                     y_lengths=y_len)
        if args.wav_out:
            from music_generation_tpu.audio.wav import (normalize_int16,
                                                        write_wav)
            n0 = min(int(y_len[0]) * cfg.hop_length, rec.shape[1])
            write_wav(args.wav_out, normalize_int16(rec[0, :n0] * 32767.0),
                      cfg.sampling_rate)
            ref0 = np.asarray(batch["audio"])[0, :n0, 0]
            base, ext = os.path.splitext(args.wav_out)
            write_wav(base + "_target" + ext,
                      normalize_int16(ref0 * 32767.0), cfg.sampling_rate)

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results[0] if len(results) == 1 else results, f,
                      indent=1)


if __name__ == "__main__":
    main()
