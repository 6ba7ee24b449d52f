"""Shell-pipeline backend + LRC + mode heuristics tests (no external engines)."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from music_generation_tpu.pipeline.lrc import (LrcParams, lyrics_to_lrc,
                                               normalize_lrc, parse_lrc)
from music_generation_tpu.pipeline.shell_backend import (ShellPipelineBackend,
                                                         template_lyrics)
from music_generation_tpu.serve.modes import (decide_mode,
                                              detect_legacy_template,
                                              extract_theme_from_template,
                                              looks_like_topic)


def test_lyrics_to_lrc_strictly_increasing():
    lines = ["第一句歌词很好", "第二句，", "第三句歌词结束。"]
    lrc = lyrics_to_lrc(lines)
    entries = parse_lrc(lrc)
    assert len(entries) == 3
    ts = [t for t, _ in entries]
    assert all(b > a for a, b in zip(ts, ts[1:]))
    assert entries[0][1] == lines[0]
    # durations bounded: line1 start=0, line2 start within [min,max]+gap
    assert 1.6 <= ts[1] <= 6.0 + 0.25 + 0.01


def test_normalize_lrc_sorts_and_nudges():
    raw = "[00:10,50] later\n[00:05:2]早\n[00:05.20] dup\n[ar:x]\n[ti:y]\n"
    out = normalize_lrc(raw)
    lines = out.strip().splitlines()
    assert lines[0] == "[ti:y]"  # canonical header order
    assert lines[1] == "[ar:x]"
    entries = parse_lrc(out)
    ts = [t for t, _ in entries]
    assert all(b > a for a, b in zip(ts, ts[1:]))  # dup nudged by 0.01


def test_mode_precedence():
    assert decide_mode({"keyword": "玫瑰"})[0] == "theme_from_keyword"
    assert decide_mode({"text": "玫瑰"})[0] == "theme_from_text"
    assert decide_mode({"text": "这是一句，有标点的长歌词内容"})[0] == "raw_from_text"
    assert decide_mode({"raw_lyrics": "第一行\n第二行"})[0] == "raw_lyrics"
    assert decide_mode({})[0] is None
    # keyword beats everything
    assert decide_mode({"keyword": "海", "text": "长歌词。", "raw_lyrics": "x"}
                       )[0] == "theme_from_keyword"


def test_legacy_template_detection():
    t = "\n".join(template_lyrics("玫瑰"))
    assert extract_theme_from_template(t) == "玫瑰"
    assert detect_legacy_template(t) == "玫瑰"
    mode, payload = decide_mode({"raw_lyrics": t})
    assert mode == "theme_from_keyword"
    assert payload["keyword"] == "玫瑰"


def test_looks_like_topic():
    assert looks_like_topic("夏天")
    assert not looks_like_topic("这是一句。有标点")
    assert not looks_like_topic("多行\n文本")
    assert not looks_like_topic("超过十六个字的超长主题输入确实太长了")


def test_backend_end_to_end_fallback(tmp_path):
    backend = ShellPipelineBackend(root=str(tmp_path), diffrhythm_repo=None)
    out = backend.run({"keyword": "玫瑰", "audio_length": 1})
    assert out["request_id"] == "REQ-00001"
    assert "玫瑰" in out["lyrics"]
    assert "[00:00.00]" in out["lrc"]
    sr, wav = wavfile.read(out["audio_path"])
    assert sr == 44100 and len(wav) > 0
    # second request increments id
    out2 = backend.run({"raw_lyrics": "自定义第一行\n自定义第二行"})
    assert out2["request_id"] == "REQ-00002"
    assert out2["lyrics"].startswith("自定义第一行")
    assert os.path.exists(os.path.join(str(tmp_path), "latest"))
