"""The trained-checkpoint tools run end-to-end on CPU: export_trained_svs
bridges a trainer step_N dir into servable per-speaker param dirs, and
eval_sung_song drives the full inference chain (incl. --pinned exact note
windows) and writes a structured result + WAV. Quality is not asserted —
the states are near-init — only that the chain holds together and the
shared build_svs_config keeps trainer and tools restore-compatible."""

import importlib.util
import json
import os
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, REPO / "tools" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    from music_generation_tpu.train import (TrainConfig, build_svs_config,
                                            create_states, save_checkpoint)
    from music_generation_tpu.train.dataset import NpyDataset
    from music_generation_tpu.train.toydata import make_toy_dataset

    root = tmp_path_factory.mktemp("tools_ckpt")
    cfg = build_svs_config(tiny=True)
    npy = make_toy_dataset(str(root / "toy"), n_utts=4, syllables=2,
                           hop=cfg.hop_length)
    ds = NpyDataset(npy, cfg, t_phones=8, t_frames=32)
    batch = {k: jnp.asarray(v) for k, v in ds.batch(2).items()}
    gen_state, disc_state, _, _ = create_states(cfg, TrainConfig(), batch)
    save_checkpoint(str(root / "run"), gen_state, disc_state, step=1)
    return str(root / "run" / "step_1"), npy


def test_build_svs_config_rejects_nsf_istft():
    from music_generation_tpu.train import build_svs_config
    with pytest.raises(ValueError, match="hifigan"):
        build_svs_config(nsf=True, decoder="istft")


def test_build_svs_config_matches_trainer_tiny():
    """The helper's tiny config must stay in lockstep with the TINY config
    the training tests use, or tool restores break on tree mismatch."""
    from music_generation_tpu.train import build_svs_config
    from tests.test_train import TINY
    assert build_svs_config(tiny=True) == TINY


def test_export_tool_writes_speaker_dirs(trained_ckpt, tmp_path, monkeypatch):
    ckpt, npy = trained_ckpt
    out = tmp_path / "served"
    tool = _load_tool("export_trained_svs")
    monkeypatch.setattr(sys, "argv", [
        "export_trained_svs", "--ckpt", ckpt, "--data-dir", npy,
        "--out", str(out), "--tiny", "--speakers", "0", "2"])
    tool.main()
    assert (out / "svs_0").is_dir() and (out / "svs_2").is_dir()

    # exported params restore into the synthesizer's load target even
    # though the trainer tree carries training-only modules (spec_encoder)
    # the inference-initialized tree lacks — the tolerant-merge contract
    from music_generation_tpu.compat.checkpoints import load_params
    from music_generation_tpu.pipeline.synthesis import SVSSynthesizer
    from music_generation_tpu.train import build_svs_config
    svs = SVSSynthesizer(build_svs_config(tiny=True), seed=3)
    restored = load_params(str(out / "svs_0"), svs.params)
    # the merge actually took trained values, not the seed-3 init
    diffs = [np.abs(np.asarray(a) - np.asarray(b)).max()
             for a, b in zip(
                 jax.tree_util.tree_leaves(svs.params["params"]["text_encoder"]),
                 jax.tree_util.tree_leaves(restored["params"]["text_encoder"]))]
    assert max(diffs) > 0
    leaves = jax.tree_util.tree_leaves(restored)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_eval_sung_song_pinned(trained_ckpt, tmp_path, monkeypatch):
    ckpt, npy = trained_ckpt
    tool = _load_tool("eval_sung_song")
    # tiny hop=16 makes 0.4 s notes 600 frames; shrink so the song fits
    # the frame buckets on CPU
    monkeypatch.setattr(tool, "SYLLABLE_SECONDS", 0.05)
    out = tmp_path / "sung.json"
    wav = tmp_path / "sung.wav"
    monkeypatch.setattr(sys, "argv", [
        "eval_sung_song", "--ckpt", ckpt, "--data-dir", npy, "--tiny",
        "--pinned", "--out", str(out), "--wav-out", str(wav)])
    tool.main()
    result = json.loads(out.read_text())
    assert result["pinned_durations"] is True
    assert result["n_notes"] == 24
    assert wav.exists() and os.path.getsize(wav) > 1000
