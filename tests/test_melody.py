"""Melody model tests: beam search semantics, enc-dec shapes, end-to-end API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_generation_tpu.models.melody import (
    BOS_ID, EOS_ID, MelodyConfig, MelodyGenerator, SDPDurationConfig,
    beam_search, handle_durations, handle_notes, lyric_dictionary_from_chars,
    note_dictionary,
)

TINY = MelodyConfig(src_vocab=50, tgt_vocab=37, n_layers=1, d_model=32,
                    d_ff=64, n_heads=2, dropout=0.0)


def test_beam_search_greedy_consistency():
    """With a deterministic peaked distribution, beam-1 == argmax chain."""
    vocab = 10

    def fake_logits(seqs, step):
        # next token = (last token + 1) % vocab, strongly peaked
        last = seqs[:, step]
        lp = jnp.full((seqs.shape[0], vocab), -20.0)
        nxt = (last + 1) % vocab
        return lp.at[jnp.arange(seqs.shape[0]), nxt].set(0.0)

    seq, score = beam_search(fake_logits, max_len=5, beam_size=3,
                             bos_id=2, eos_id=9)
    np.testing.assert_array_equal(np.asarray(seq), [3, 4, 5, 6, 7])


def test_beam_search_freezes_on_eos():
    vocab = 6

    def fake_logits(seqs, step):
        lp = jnp.full((seqs.shape[0], vocab), -20.0)
        return lp.at[:, 5].set(0.0)  # always emit EOS=5

    seq, _ = beam_search(fake_logits, max_len=4, beam_size=2, bos_id=2, eos_id=5)
    got = np.asarray(seq)
    assert got[0] == 5
    assert (got[1:] == 0).all()  # frozen to PAD afterwards


def test_handle_notes():
    assert handle_notes(["60", "<EOS>", "62"], 4) == ["60", "62", "62", "62"]
    assert handle_notes(["60", "61", "62"], 2) == ["60", "61"]


def test_handle_durations_clamp():
    assert handle_durations([0.1, 0.5, 3.0]) == [0.3201, 0.5, 0.4305]


@pytest.fixture(scope="module")
def generator():
    lyric_dict = lyric_dictionary_from_chars("你好世界小的天有大梦想")
    return MelodyGenerator(lyric_dict, note_dictionary(), cfg=TINY,
                           duration_variant="mse")


def test_generate_melody_mse(generator):
    lyric = "小小的天有大大的梦想"
    out_lyric, notes, durations = generator.generate(lyric, index=0)
    assert out_lyric == lyric + "AP"
    assert len(notes) == len(lyric) + 1
    assert len(durations) == len(lyric) + 1
    assert notes[-1] == "rest"
    assert durations[-1] == 0.6
    # all note tokens decode as midi ints in the dictionary range
    assert all(49 <= int(n) <= 81 for n in notes[:-1])


def test_generate_melody_with_previous(generator):
    l1 = "你好世界"
    _, notes1, _ = generator.generate(l1, index=0)
    out, notes2, durs2 = generator.generate("大大的梦想", index=1,
                                            previous_notes=notes1)
    assert len(notes2) == 6  # 5 chars + rest
    assert durs2[-1] == 0.6


def test_generate_melody_sdp():
    lyric_dict = lyric_dictionary_from_chars("你好世界")
    gen = MelodyGenerator(lyric_dict, note_dictionary(), cfg=TINY,
                          duration_variant="sdp",
                          sdp_cfg=SDPDurationConfig(
                              src_vocab=lyric_dict.size, hidden_dim=32,
                              n_layers=1, n_heads=2, pf_dim=64))
    _, notes, durations = gen.generate("你好世界", index=0)
    assert len(notes) == 5 and len(durations) == 5
    # SDP durations are clamped into the reference's band (plus tail 0.6)
    assert all(0.15 < d <= 2.0 or d == 0.6 for d in durations)
