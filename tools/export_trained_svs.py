"""Export a GAN trainer checkpoint into a servable pipeline checkpoint dir.

The trainer (music_generation_tpu.train) saves step_N dirs holding full
gen/disc train states; the serving pipeline (`serve.app --checkpoint-dir`)
restores per-component param trees written by compat.save_pipeline
(svs_0, svs_1, ..., melody_notes, melody_duration). This tool bridges the
two: restore the trainer state, strip it to generator params, and write
them under every requested speaker id — the reference's multispeaker
dispatch loads one .pth per singer the same way
(pipline_inference_svs_v6_multispeaker.py:166-171).

Usage:
  python tools/export_trained_svs.py --ckpt /root/runs/gan_nsf/step_8000 \
      --data-dir /root/runs/toy/npy --out /root/runs/served_ckpt \
      [--nsf] [--tiny] [--speakers 0 1 2]

Then serve it:
  python -m music_generation_tpu.serve.app --checkpoint-dir \
      /root/runs/served_ckpt --nsf
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="trainer step_N directory")
    p.add_argument("--data-dir", required=True,
                   help="npy dataset dir (shapes the restore target)")
    p.add_argument("--out", required=True,
                   help="pipeline checkpoint dir to write (svs_<id> subdirs)")
    p.add_argument("--nsf", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--decoder", default="hifigan",
                   choices=("hifigan", "istft", "mb_istft"),
                   help="must match the trainer's --decoder or the orbax "
                        "restore target tree mismatches")
    p.add_argument("--f0-residual", action="store_true",
                   help="checkpoint was trained with --f0-residual (the F0 "
                        "head is a deviation around the note pitch; the "
                        "param tree is unchanged but inference must add "
                        "the note-lf0 base)")
    p.add_argument("--speakers", type=int, nargs="+", default=[0])
    args = p.parse_args()

    import jax.numpy as jnp

    from music_generation_tpu.compat.checkpoints import save_params
    from music_generation_tpu.train import (TrainConfig, build_svs_config,
                                            create_states, restore_checkpoint,
                                            tool_shapes)
    from music_generation_tpu.train.dataset import NpyDataset

    try:
        cfg = build_svs_config(tiny=args.tiny, decoder=args.decoder,
                               nsf=args.nsf, f0_residual=args.f0_residual)
    except ValueError as e:
        p.error(str(e))
    t_phones, t_frames = tool_shapes(args.tiny)

    ds = NpyDataset(args.data_dir, cfg, t_phones=t_phones, t_frames=t_frames)
    batch = {k: jnp.asarray(v) for k, v in ds.batch(2).items()}
    gen_state, disc_state, _, _ = create_states(cfg, TrainConfig(), batch)
    gen_state, _ = restore_checkpoint(os.path.abspath(args.ckpt), gen_state,
                                      disc_state)
    for sid in args.speakers:
        path = os.path.join(args.out, f"svs_{sid}")
        # SVSSynthesizer.params (the load_pipeline restore target) is the
        # full variables dict; the trainer state holds the inner tree
        save_params(path, {"params": gen_state.params})
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
