"""Convert reference VISinger .pth checkpoints into this framework's format.

Usage:
  python tools/import_reference_checkpoints.py \
      --pth G_AE.pth [--pth G_AE_F09.pth --pth G_AE_F19.pth] \
      --out ./checkpoints/pipeline [--no-autoencoder]

Each --pth becomes svs_<i> in the output dir (singer ids in order), loadable
via music_generation_tpu.compat.load_pipeline. Accepts both raw state_dicts
and the reference trainer's {'model': state_dict, 'iteration': ...} wrapper
(VISinger/utils/utils.py:61-72).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", action="append", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--no-autoencoder", action="store_true",
                   help="checkpoint is the non-AE models.py variant")
    args = p.parse_args()

    import torch
    from music_generation_tpu.compat import save_params
    from music_generation_tpu.compat.torch_import import (
        visinger_params_from_torch)
    from music_generation_tpu.models.svs import SVSConfig

    cfg = SVSConfig(autoencoder=not args.no_autoencoder)
    for i, path in enumerate(args.pth):
        blob = torch.load(path, map_location="cpu")
        state_dict = blob.get("model", blob) if isinstance(blob, dict) else blob
        params = visinger_params_from_torch(state_dict, cfg)
        out = os.path.join(args.out, f"svs_{i}")
        save_params(out, params)
        print(f"{path} -> {out}")


if __name__ == "__main__":
    main()
