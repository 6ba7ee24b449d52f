"""Golden tests for the reference-compatible lyric tokenizers.

Contracts:
  * GPT-2 path — ``BertTokenizerFast(vocab_file=..., ...)`` with 8 added
    special tokens (Lyric_generator/generator.py:11-19).  Oracle:
    transformers' BertTokenizerFast over the same vocab file.
  * T5 path — sentencepiece unigram (Lyric_generator_t5/generator.py:21-27).
    Oracle: an HF ``tokenizers`` Unigram pipeline assembled exactly like
    transformers' T5 converter (Precompiled charsmap + Metaspace), which is
    the independent reimplementation of sentencepiece that HF validates
    against upstream.

Both oracles are only used inside the tests; production code is pure
stdlib + numpy.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from music_generation_tpu.models.lyrics import (  # noqa: E402
    T5SentencePieceTokenizer, WordPieceTokenizer)
from music_generation_tpu.models.lyrics.api import (  # noqa: E402
    default_tokenizer, find_vocab_artifact)
from music_generation_tpu.models.lyrics.wordpiece import (  # noqa: E402
    ADDED_TOKENS)

VOCAB_TXT = find_vocab_artifact("gpt2")
SPIECE = find_vocab_artifact("t5")

TEXTS = [
    "夏天",
    "月亮代表我的心",
    "宁夏的夜晚，月光洒满大地",
    "关键词：月亮 长度：15",
    "关键词：夏天的风 长度：15",
    "爱你一万年，不变的心",
    "Hello, World! 123",
    "ＡＢＣ全角１２３",
    "温度是25℃，占80％",
    "唧唧复唧唧，木兰当户织",
    "风吹过    麦浪",
    "ﬁﬂ ligatures ⅣⅤⅥ",
]


@pytest.mark.skipif(VOCAB_TXT is None, reason="vocab.txt artifact absent")
class TestWordPiece:
    @pytest.fixture(scope="class")
    def tok(self):
        return WordPieceTokenizer(VOCAB_TXT)

    @pytest.fixture(scope="class")
    def oracle(self):
        transformers = pytest.importorskip("transformers")
        ref = transformers.BertTokenizerFast(
            vocab_file=VOCAB_TXT, sep_token="[SEP]", pad_token="[PAD]",
            cls_token="[CLS]")
        ref.add_special_tokens(
            {"additional_special_tokens": list(ADDED_TOKENS)})
        return ref

    def test_vocab_size_matches_checkpoint_config(self, tok):
        # Lyric_generator/checkpoint/config.json: vocab_size 21136
        assert tok.vocab_size == 21136

    def test_encode_matches_hf(self, tok, oracle):
        for t in TEXTS + list(ADDED_TOKENS):
            assert tok.encode(t) == oracle.encode(
                t, add_special_tokens=False), t

    def test_encode_with_specials_matches_hf(self, tok, oracle):
        for t in TEXTS[:4]:
            assert tok.encode(t, add_special_tokens=True) == oracle.encode(t)

    def test_style_token_ids(self, tok, oracle):
        # reference prompt uses style_ids[1] = the added-token id
        # (Lyric_generator/generator.py:30-36)
        for s in ADDED_TOKENS:
            assert tok.token_id(s) == oracle.convert_tokens_to_ids(s)

    def test_decode_roundtrip(self, tok):
        ids = tok.encode("月亮代表我的心")
        assert tok.decode(ids) == "月亮代表我的心"


@pytest.mark.skipif(SPIECE is None, reason="spiece.model artifact absent")
class TestSentencePieceUnigram:
    @pytest.fixture(scope="class")
    def tok(self):
        return T5SentencePieceTokenizer(SPIECE)

    @pytest.fixture(scope="class")
    def oracle(self):
        tokenizers = pytest.importorskip("tokenizers")
        pb2 = pytest.importorskip(
            "transformers.utils.sentencepiece_model_pb2_new")
        m = pb2.ModelProto()
        with open(SPIECE, "rb") as f:
            m.ParseFromString(f.read())
        ot = tokenizers.Tokenizer(tokenizers.models.Unigram(
            [(p.piece, p.score) for p in m.pieces], unk_id=2,
            byte_fallback=False))
        norm = tokenizers.normalizers
        ot.normalizer = norm.Sequence([
            norm.Precompiled(m.normalizer_spec.precompiled_charsmap),
            norm.Strip(left=False, right=True),
            norm.Replace(tokenizers.Regex(" {2,}"), "▁"),
        ])
        ot.pre_tokenizer = tokenizers.pre_tokenizers.Metaspace(
            replacement="▁", prepend_scheme="never")
        return ot

    def test_vocab_size_matches_checkpoint_config(self, tok):
        # Lyric_generator_t5/checkpoint/config.json: vocab_size 32128
        # = 32028 sentencepiece + 100 <extra_id_k>
        assert tok.sp.vocab_size == 32028
        assert tok.vocab_size == 32128

    def test_special_ids(self, tok):
        assert tok.pad_id == 0 and tok.eos_id == 1 and tok.unk_id == 2
        assert tok.token_id("<extra_id_0>") == 32127
        assert tok.token_id("<extra_id_99>") == 32028

    def test_encode_matches_hf_tokenizers(self, tok, oracle):
        for t in TEXTS:
            assert tok.encode(t) == oracle.encode(t).ids, t

    def test_encode_appends_eos(self, tok):
        ids = tok.encode("关键词：月亮 长度：15", add_eos=True)
        assert ids[-1] == 1

    def test_nfkc_normalization(self, tok):
        # precompiled nmt_nfkc charsmap: full-width + unit folding
        assert tok.sp.normalize("ＡＢＣ") == "ABC"
        assert tok.sp.normalize("℃") == "°C"
        assert tok.sp.normalize("a  b") == "a▁b"

    def test_decode_roundtrip(self, tok):
        ids = tok.encode("宁夏的夜晚")
        assert tok.decode(ids) == "宁夏的夜晚"


def test_default_tokenizer_prefers_reference_artifacts():
    t5 = default_tokenizer("t5")
    gpt2 = default_tokenizer("gpt2")
    if SPIECE is not None:
        assert isinstance(t5, T5SentencePieceTokenizer)
    if VOCAB_TXT is not None:
        assert isinstance(gpt2, WordPieceTokenizer)
    # tiny builds always use the self-contained char tokenizer
    from music_generation_tpu.models.lyrics import CharTokenizer
    assert isinstance(default_tokenizer("t5", tiny=True), CharTokenizer)
