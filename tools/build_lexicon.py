"""Re-encode the reference G2P lexicon tables into this framework's single-file format.

The upstream reference (GuluOfficial/music_generation) ships its Mandarin G2P data as
four separate artifacts:
  - text_normalizers/data/monosyllable.csv   (JSON: char -> pinyin+tone)
  - text_normalizers/data/polyphone.csv      (JSON: char -> {pinyin: [phrases...]})
  - two parallel strings of traditional/simplified characters embedded in
    text_normalizers/phoneme_generator.py
  - VISinger/phone_set.json (61 phones) and VISinger/phone_shengdiao_set.json
    (247 tone-marked phones)

We store all of it in one gzipped JSON blob, `music_generation_tpu/frontend/data/
lexicon.json.gz`, keyed by purpose. This script is a one-time build step run against
a checkout of the reference; the generated blob is committed so the framework is
fully standalone.
"""

import gzip
import json
import os
import sys

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
OUT = os.path.join(
    os.path.dirname(__file__), "..", "music_generation_tpu", "frontend", "data",
    "lexicon.json.gz",
)


def load_json(path):
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def main():
    mono = load_json(os.path.join(REF, "text_normalizers/data/monosyllable.csv"))
    poly = load_json(os.path.join(REF, "text_normalizers/data/polyphone.csv"))
    phones = load_json(os.path.join(REF, "VISinger/phone_set.json"))
    phones_tone = load_json(os.path.join(REF, "VISinger/phone_shengdiao_set.json"))

    # The traditional->simplified table lives as two aligned strings in
    # phoneme_generator.py; extract them by importing the module source.
    src = open(
        os.path.join(REF, "text_normalizers/phoneme_generator.py"), encoding="utf-8"
    ).read()
    namespace = {}
    for line in src.splitlines():
        s = line.strip()
        if s.startswith("TRADITION = r\"") or s.startswith("SIMPLE = r\""):
            key, _, val = s.partition(" = ")
            namespace[key] = eval(val)  # raw string literal
    trad, simp = namespace["TRADITION"], namespace["SIMPLE"]
    assert len(trad) == len(simp)
    # Store as a mapping; first occurrence wins (mirrors str.find semantics).
    t2s = {}
    for t, s in zip(trad, simp):
        t2s.setdefault(t, s)

    blob = {
        "monosyllable": mono,
        "polyphone": poly,
        "trad2simp": t2s,
        "phone_set": phones,
        "phone_shengdiao_set": phones_tone,
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        json.dump(blob, f, ensure_ascii=False, separators=(",", ":"))
    print(f"wrote {OUT}: {len(mono)} mono, {len(poly)} poly, {len(t2s)} t2s, "
          f"{len(phones)} phones, {len(phones_tone)} tone phones")


if __name__ == "__main__":
    main()
