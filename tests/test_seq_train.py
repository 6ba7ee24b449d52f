"""Sequence-family training CLIs (melody note/duration + lyric LMs).

Covers VERDICT round-1 gap #5: every family trains to a falling loss via
python -m music_generation_tpu.train.seq, with orbax save/resume.
"""

import numpy as np
import pytest

from music_generation_tpu.train.seq import (_melody_pairs_from_transcriptions,
                                            train_family)

FAMILIES = ["melody_note", "duration_mse", "duration_sdp", "gpt2", "t5"]


@pytest.mark.parametrize("family", FAMILIES)
def test_family_trains_to_falling_loss(family):
    losses = train_family(family, steps=14, batch_size=8, tiny=True,
                          log_every=100)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.97, (losses[0], losses[-1])


def test_save_and_resume(tmp_path):
    train_family("duration_mse", steps=4, batch_size=4, tiny=True,
                 ckpt_dir=str(tmp_path), log_every=100)
    ck = tmp_path / "duration_mse" / "step_4"
    assert ck.exists()
    losses = train_family("duration_mse", steps=3, batch_size=4, tiny=True,
                          resume=str(ck), log_every=100)
    assert len(losses) == 3 and np.isfinite(losses).all()


def test_melody_pairs_from_transcriptions(tmp_path):
    f = tmp_path / "t.txt"
    f.write_text(
        "utt001|你好|n i3 h ao3|C4 C4 D4 D4|0.3 0.3 0.4 0.4|"
        "0.1 0.2 0.15 0.25\n", encoding="utf-8")
    pairs = _melody_pairs_from_transcriptions(str(f))
    assert pairs == [("你好", ["C4", "D4"], [0.3, 0.4])]


def test_melody_batcher_matches_serving_encode():
    """Training src must use the SAME [BOS] chars [EOS] layout the serving
    path feeds at inference (api._encode_src) — regression for the
    train/serve skew that silently wrecked free-running decode accuracy."""
    import numpy as np
    from music_generation_tpu.frontend import load_lexicon
    from music_generation_tpu.models.melody import (
        MelodyConfig, MelodyGenerator, lyric_dictionary_from_chars,
        note_dictionary)
    from music_generation_tpu.train.seq import _MelodyBatcher

    chars = sorted(load_lexicon().monosyllable.keys())
    ld, nd = lyric_dictionary_from_chars(chars), note_dictionary()
    text = "你好世界"
    batcher = _MelodyBatcher([(text, ["C4"] * 4, [0.3] * 4)], ld, nd)
    b = batcher.batch(1)
    mg = MelodyGenerator(ld, nd,
                         cfg=MelodyConfig(src_vocab=ld.size,
                                          tgt_vocab=nd.size, n_layers=1,
                                          d_model=32, d_ff=64, n_heads=2))
    served = mg._encode_src(text)[0]
    n = 4 + 2  # BOS + chars + EOS
    np.testing.assert_array_equal(b["src"][0][:n], served[:n])
    # durations align with char positions 1..n (BOS/EOS slots stay 0)
    assert b["durations_cs"][0][0] == 0
    assert (b["durations_cs"][0][1:5] == 30).all()


def test_melody_note_prev_trains():
    """The previous-sentence conditioning path (dot-attention memory, used
    by serving for every sentence after the first) trains to falling loss
    on pairs whose targets are decodable only through the prev memory."""
    from music_generation_tpu.train.seq import train_family
    losses = train_family("melody_note_prev", steps=30, batch_size=16,
                          tiny=True, log_every=30)
    assert losses[-1] < losses[0]


def test_seq2seq_family_trains():
    """The melody_v2 RNN family (lyric2note + lyric2duration +
    note2duration) trains jointly to falling loss with the serving
    vocabularies and decode conventions."""
    from music_generation_tpu.train.seq import train_family
    losses = train_family("seq2seq", steps=25, batch_size=8,
                          tiny=True, log_every=25)
    assert losses[-1] < losses[0]


def test_telemelody_family_trains():
    """TeleMelody's twin transformers (lyric2rhythm + trend2melody) train
    jointly to falling loss with the sampler's token framing."""
    from music_generation_tpu.train.seq import train_family
    losses = train_family("telemelody", steps=25, batch_size=8,
                          tiny=True, log_every=25)
    assert losses[-1] < losses[0]


def test_telemelody_trains_on_transcriptions(tmp_path):
    """--data for telemelody: rhythm/trend/note streams derived from real
    transcriptions on the serving REMI grid (round-2 parity gap — the
    family previously refused --data)."""
    from music_generation_tpu.train.seq import (
        _telemelody_pairs_from_transcriptions)
    f = tmp_path / "t.txt"
    f.write_text(
        "utt001|你好世界|n i3 h ao3 sh i4 j ie4|C4 C4 D4 D4 E4 E4 G4 G4|"
        "0.3 0.3 0.4 0.4 0.5 0.5 0.25 0.25|"
        "0.1 0.2 0.15 0.25 0.2 0.3 0.1 0.15\n", encoding="utf-8")
    pairs = _telemelody_pairs_from_transcriptions(str(f))
    assert len(pairs) == 1
    chars, rhythm, trend, note_toks = pairs[0]
    assert chars == ["你", "好", "世", "界"]
    assert len(rhythm) == 4 and all(r in "0123" for r in rhythm)
    assert trend[0] == "MAJ" and len(trend) == 1 + 3 * 4
    assert trend[2] == "NOT" and trend[-1].startswith("BEAT_")
    assert trend[-2] == "AUT"
    # note stream: Bar/Pos/Pitch/Dur per syllable on the 0.125 s grid
    assert note_toks[:4] == ["Bar_0", "Pos_0", "Pitch_60", "Dur_2"]
    assert note_toks[4:8] == ["Bar_0", "Pos_2", "Pitch_62", "Dur_3"]
    losses = train_family("telemelody", steps=14, batch_size=8, tiny=True,
                          data=str(f), log_every=100)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.97, (losses[0], losses[-1])


def test_toy_lyric_grammar():
    """The toy lyric corpus is CFG-generated (subject-verb-object song
    clichés from a >=2-char-word lexicon) and lyric_grammar_check verifies
    both directions: every corpus line parses fully; char-soup and
    isolated-punctuation degeneracies fail (reference product bar:
    corpus-trained LMs emit readable lines, Lyric_generator/generator.py)."""
    from music_generation_tpu.train.seq import (_toy_lyric_lines,
                                                lyric_grammar_check)
    for line in _toy_lyric_lines(n=64, seed=3):
        c = lyric_grammar_check(line)
        assert c["passed"] and c["parsed_frac"] == 1.0, (line, c)
        assert 3 <= c["n_phrases"] <= 5
    # round-4's actual served output (char soup) must fail
    assert not lyric_grammar_check("麦上浪心中，唱，中繁星代玜")["passed"]
    # isolated punctuation fails even with in-grammar words
    assert not lyric_grammar_check("，月亮照亮我的心。")["passed"]
    assert not lyric_grammar_check("月亮照亮我的心，，星星闪耀。")["passed"]
    # a well-formed unseen sentence passes
    assert lyric_grammar_check("遥远的大海拥抱旧时光，星星闪耀。")["passed"]
