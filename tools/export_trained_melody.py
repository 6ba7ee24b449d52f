"""Export train.seq melody checkpoints into a servable pipeline ckpt dir.

train.seq saves ``{ckpt_dir}/{family}/step_N`` holding
``{"params", "opt_state", "step"}``; serving restores plain param trees
named ``melody_notes`` / ``melody_duration`` (compat.load_pipeline — the
reference loads one .pth per model the same way,
pipline_inference_svs_v6_multispeaker.py:166-171). This strips the train
state to params and writes the serving layout, so a full checkpoint dir
(svs_* from tools/export_trained_svs.py + melody from here) serves real
trained notes AND durations — without this the served melody is
random-init and emits near-zero durations (blip audio).

Usage:
  python tools/export_trained_melody.py \
      --notes /root/runs/melody_toy/melody_note/step_800 \
      --duration /root/runs/melody_toy/duration_mse/step_800 \
      --out /root/runs/served_ms
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _restore_params(path: str):
    import orbax.checkpoint as ocp
    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    if not isinstance(raw, dict) or "params" not in raw:
        raise SystemExit(f"{path}: not a train.seq checkpoint "
                         f"(keys: {list(raw)[:4] if isinstance(raw, dict) else type(raw)})")
    return raw["params"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--notes", required=True,
                   help="train.seq melody_note step_N dir")
    p.add_argument("--duration", required=True,
                   help="train.seq duration_mse step_N dir")
    p.add_argument("--out", required=True,
                   help="pipeline checkpoint dir (melody_notes + "
                        "melody_duration written next to svs_*)")
    args = p.parse_args()

    from music_generation_tpu.compat.checkpoints import save_params

    os.makedirs(args.out, exist_ok=True)
    save_params(os.path.join(args.out, "melody_notes"),
                _restore_params(args.notes))
    save_params(os.path.join(args.out, "melody_duration"),
                _restore_params(args.duration))
    print(f"wrote {args.out}/melody_notes + melody_duration")


if __name__ == "__main__":
    main()
