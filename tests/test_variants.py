"""Server variant preset tests."""

import pytest

from music_generation_tpu.serve.variants import (VARIANTS, VariantSpec,
                                                 build_melody_generator,
                                                 canned_response)


def test_variant_table():
    assert set(VARIANTS) == {"v1", "v1_model", "melody_v2", "svs_v5",
                             "svs_v5_multispeaker", "svs_v6_multispeaker"}
    assert VARIANTS["v1_model"].accompaniment
    assert VARIANTS["v1"].backend == "shell"
    assert VARIANTS["svs_v5"].melody == "sdp"
    assert VARIANTS["svs_v6_multispeaker"].n_speakers == 3


def test_canned_response_absent_dir():
    assert canned_response("宁夏", None) is None
    assert canned_response("宁夏", "/nonexistent") is None
    assert canned_response("别的", "./resources") is None


def test_canned_response_with_files(tmp_path):
    (tmp_path / "宁夏.txt").write_text("宁静的夏天", encoding="utf-8")
    (tmp_path / "宁夏.wav").write_bytes(b"RIFFfake")
    out = canned_response("宁夏", str(tmp_path))
    assert out["code"] == 200
    assert out["data"]["lyrics"] == "宁静的夏天"


@pytest.mark.parametrize("melody", ["seq2seq", "telemelody"])
def test_adapter_generators(melody):
    spec = VariantSpec("x", melody=melody)
    gen = build_melody_generator(spec, tiny=True)
    lyrics, tokens, durations = gen.generate("你好世界")
    assert len(tokens) == len(durations)
    assert tokens[-1] == "rest"
    assert all(t == "rest" or t.isdigit() for t in tokens)
