"""Two-voice multispeaker proof through the served HTTP path.

The reference serves three separately trained voices dispatched by
``singer_id`` (pipline_inference_svs_v6_multispeaker.py:166-171,232-239).
This tool demonstrates the same axis end to end with two differently-trained
toy voices (train/toydata.py VOICES: "bright" = original sine-singer,
"deep" = darker harmonics sung an octave below the written score):

  1. spawns `serve.app --checkpoint-dir <dir>` (svs_0 = bright ckpt,
     svs_1 = deep ckpt, written by tools/export_trained_svs.py)
  2. POSTs /synthesis_music with the SAME lyrics and singer_id 0 / 1 —
     identical score, different voice
  3. measures per-voice median YIN F0 and spectral centroid from the
     returned WAVs and asserts they differ the way the training data does
     (deep ~1 octave below, centroid well under bright's)

Writes artifacts/multispeaker_demo.json + artifacts/multispeaker_<id>.wav.

Usage:
  python tools/multispeaker_demo.py --checkpoint-dir /root/runs/served_ms \
      --nsf --f0-residual [--port 5113] [--text 你好世界天地人和]
"""

import argparse
import base64
import io
import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def wait_healthz(port: int, timeout_s: float, proc) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if proc.poll() is not None:
            raise RuntimeError(f"server exited rc={proc.returncode}")
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
                if r.status == 200:
                    return
        except Exception:
            time.sleep(5)
    raise TimeoutError(f"server not healthy after {timeout_s}s")


def synthesize(port: int, text: str, singer_id: int, timeout_s: float):
    body = json.dumps({"text": text, "singer_id": singer_id}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/synthesis_music", data=body,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout_s) as r:
        resp = json.loads(r.read())
    if resp.get("code") != 200:
        raise RuntimeError(f"singer {singer_id}: {resp}")
    return base64.b64decode(resp["data"]["audio"])


def voice_stats(wav_bytes: bytes) -> dict:
    import numpy as np
    from scipy.io import wavfile

    from music_generation_tpu.audio.f0 import yin_f0

    sr, wav = wavfile.read(io.BytesIO(wav_bytes))
    x = wav.astype(np.float32) / 32768.0
    f0 = yin_f0(x, sample_rate=sr, hop=256)
    voiced = f0[f0 > 0]
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), 1.0 / sr)
    return {
        "audio_s": round(len(x) / sr, 2),
        "median_f0_hz": round(float(np.median(voiced)), 1) if len(voiced)
        else None,
        "spectral_centroid_hz": round(float((mag * freqs).sum()
                                            / max(mag.sum(), 1e-9)), 1),
        "rms": round(float(np.sqrt((x ** 2).mean())), 4),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint-dir", required=True,
                   help="pipeline ckpt dir with svs_0 (bright) + svs_1 "
                        "(deep) from tools/export_trained_svs.py")
    p.add_argument("--port", type=int, default=5113)
    p.add_argument("--text", default="你好世界天地人和",
                   help="lyrics (toy-lexicon chars; both voices sing the "
                        "same melody)")
    p.add_argument("--nsf", action="store_true")
    p.add_argument("--f0-residual", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--out", default="artifacts/multispeaker_demo.json")
    p.add_argument("--wav-prefix", default="artifacts/multispeaker")
    p.add_argument("--startup-timeout", type=float, default=1800.0)
    p.add_argument("--request-timeout", type=float, default=1800.0)
    p.add_argument("--provenance", default=None,
                   help="JSON string recording how the two checkpoints "
                        "were trained (stored verbatim in the artifact)")
    args = p.parse_args()

    import numpy as np

    cmd = [sys.executable, "-m", "music_generation_tpu.serve.app",
           "--port", str(args.port), "--checkpoint-dir", args.checkpoint_dir]
    for flag in ("nsf", "f0_residual", "tiny"):
        if getattr(args, flag):
            cmd.append("--" + flag.replace("_", "-"))
    proc = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        wait_healthz(args.port, args.startup_timeout, proc)
        result = {"text": args.text, "checkpoint_dir": args.checkpoint_dir,
                  "voices": {}}
        for sid, name in ((0, "bright"), (1, "deep")):
            wav = synthesize(args.port, args.text, sid,
                             args.request_timeout)
            path = f"{args.wav_prefix}_{name}.wav"
            with open(path, "wb") as f:
                f.write(wav)
            stats = voice_stats(wav)
            stats["wav"] = path
            result["voices"][name] = stats
            print(f"singer {sid} ({name}): {stats}", flush=True)

        b, d = result["voices"]["bright"], result["voices"]["deep"]
        gap_st = (12.0 * np.log2(b["median_f0_hz"] / d["median_f0_hz"])
                  if b["median_f0_hz"] and d["median_f0_hz"] else None)
        result["register_gap_semitones"] = (round(float(gap_st), 2)
                                            if gap_st is not None else None)
        result["centroid_ratio_deep_over_bright"] = round(
            d["spectral_centroid_hz"] / b["spectral_centroid_hz"], 3)
        # the training data places deep one octave down with a darker
        # spectrum; served voices must reproduce both distinctions
        result["voices_distinct"] = bool(
            gap_st is not None and 9.0 <= gap_st <= 15.0
            and result["centroid_ratio_deep_over_bright"] < 0.75)
        if args.provenance:
            result["provenance"] = json.loads(args.provenance)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1, ensure_ascii=False)
            f.write("\n")
        print(json.dumps({k: v for k, v in result.items()
                          if k != "voices"}, ensure_ascii=False))
        if not result["voices_distinct"]:
            sys.exit("voices are NOT distinct — see " + args.out)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()
