"""Import the reference lyric-tokenizer vocabulary artifacts.

Copies the BERT wordpiece vocab (GPT-2, Lyric_generator/checkpoint/vocab.txt)
and the sentencepiece unigram model (T5, Lyric_generator_t5/checkpoint/
spiece.model) into ./checkpoints/vocab so the framework serves with
reference-compatible vocabularies without needing the reference mount at
runtime (resolution order in models/lyrics/api.py:find_vocab_artifact).

Usage:
  python tools/import_tokenizers.py [--ref /root/reference] [--out checkpoints/vocab]
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ARTIFACTS = {
    "vocab.txt": "Lyric_generator/checkpoint/vocab.txt",
    "spiece.model": "Lyric_generator_t5/checkpoint/spiece.model",
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ref", default=os.environ.get(
        "MUSIC_GEN_REFERENCE_DIR", "/root/reference"))
    p.add_argument("--out", default=os.path.join("checkpoints", "vocab"))
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for name, rel in ARTIFACTS.items():
        src = os.path.join(args.ref, rel)
        dst = os.path.join(args.out, name)
        if not os.path.exists(src):
            print(f"missing: {src} (skipped)")
            continue
        shutil.copyfile(src, dst)
        print(f"{src} -> {dst}")

    # sanity: load both through the framework tokenizers
    from music_generation_tpu.models.lyrics import (T5SentencePieceTokenizer,
                                                    WordPieceTokenizer)
    wp = WordPieceTokenizer(os.path.join(args.out, "vocab.txt"))
    t5 = T5SentencePieceTokenizer(os.path.join(args.out, "spiece.model"))
    print(f"wordpiece vocab={wp.vocab_size} t5 vocab={t5.vocab_size}")
    assert wp.vocab_size == 21136 and t5.vocab_size == 32128


if __name__ == "__main__":
    main()
