"""Does MAS train models as well as duration annotations do?

Round-2/3 done-criterion for the live MAS path (`train --durations mas`,
ops/monotonic_align.py; the commented-out VITS path the reference carries at
VISinger/models.py:590-604): at EQUAL steps and otherwise identical flags,
the MAS-trained checkpoint's copy-synthesis mel-L1 must be within ~10% of
the GT-duration-trained checkpoint's. Runs tools/eval_copy_synthesis.py on
both and writes the comparison artifact.

Usage:
  python tools/mas_vs_gt.py --gt-ckpt /root/runs/gt_snap/step_2000 \
      --mas-ckpt /root/runs/gan_mas/step_2000 --data-dir /root/runs/toy/npy \
      --nsf --noise-scale 0 --out artifacts/mas_vs_gt.json
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

TOOLS = os.path.dirname(os.path.abspath(__file__))


def run_eval(ckpts: list[str], data_dir: str, extra: list[str]) -> list[dict]:
    """One subprocess for ALL of a side's checkpoints: they share one jit
    program (the compile dominates; orbax restores are cheap)."""
    out = tempfile.mktemp(suffix=".json")
    cmd = [sys.executable, os.path.join(TOOLS, "eval_copy_synthesis.py"),
           "--ckpt", *ckpts, "--data-dir", data_dir, "--out", out] + extra
    subprocess.run(cmd, check=True)
    with open(out) as f:
        res = json.load(f)
    return res if isinstance(res, list) else [res]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt-ckpt", required=True, nargs="+",
                   help="checkpoint(s) trained with dataset phone durations")
    p.add_argument("--mas-ckpt", required=True, nargs="+",
                   help="same-flags checkpoint(s) trained with --durations "
                        "mas, at the SAME steps (pairwise with --gt-ckpt); "
                        "several step pairs average out GAN step-to-step "
                        "noise")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--nsf", action="store_true")
    p.add_argument("--noise-scale", type=float, default=0.0)
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--tolerance", type=float, default=0.10,
                   help="allowed relative mel-L1 excess of MAS over GT")
    p.add_argument("--out", default="artifacts/mas_vs_gt.json")
    args = p.parse_args()

    extra = ["--noise-scale", str(args.noise_scale), "--n", str(args.n)]
    if args.tiny:
        extra.append("--tiny")
    if args.nsf:
        extra.append("--nsf")
    if len(args.gt_ckpt) != len(args.mas_ckpt):
        p.error("--gt-ckpt and --mas-ckpt must pair up step for step")
    gt = run_eval(args.gt_ckpt, args.data_dir, extra)
    mas = run_eval(args.mas_ckpt, args.data_dir, extra)

    pairs = []
    for g, m in zip(gt, mas):
        gl, ml = float(g["mel_l1_trained"]), float(m["mel_l1_trained"])
        pairs.append({"gt_ckpt": g["ckpt"], "mas_ckpt": m["ckpt"],
                      "mel_l1_gt": gl, "mel_l1_mas": ml,
                      "ratio": round(ml / max(gl, 1e-9), 4)})
    mean_ratio = sum(x["ratio"] for x in pairs) / len(pairs)
    max_ratio = max(x["ratio"] for x in pairs)
    # the criterion is per-pair (round-4 lesson: averaging let one
    # favorable step mask two failing ones); the mean is reported as
    # context only
    result = {
        "pairs": pairs,
        "mean_mas_over_gt_ratio": round(mean_ratio, 4),
        "max_mas_over_gt_ratio": round(max_ratio, 4),
        "all_pairs_within_tolerance": bool(
            max_ratio <= 1.0 + args.tolerance),
        "tolerance": args.tolerance,
        "summary": (f"MAS-trained mel-L1 within "
                    f"{max(0.0, (max_ratio - 1.0)) * 100:.0f}% of "
                    f"ground-truth-duration training on every evaluated "
                    f"step pair"),
        "gt_eval": gt,
        "mas_eval": mas,
    }
    print(json.dumps({k: v for k, v in result.items()
                      if not k.endswith("_eval")}))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
