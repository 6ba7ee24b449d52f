"""Inference checkpoint save/load for the serving pipeline (orbax).

Replaces the reference's per-model .pth loading at import time
(pipline_inference_svs_v6_multispeaker.py:166-171) with explicit orbax
checkpoints per component; the torch importer (compat.torch_import) feeds
the same format when migrating reference weights.
"""

from __future__ import annotations

import os


def save_params(path: str, params) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, target):
    """Restore params with the same tolerant contract as the reference's
    load_checkpoint: missing subtree -> keep the target's initialization."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def save_pipeline(ckpt_dir: str, song_synthesizer) -> None:
    """Persist every component of a SongSynthesizer."""
    for sid, svs in song_synthesizer.synthesizers.items():
        save_params(os.path.join(ckpt_dir, f"svs_{sid}"), svs.params)
    melody = song_synthesizer.melody
    if hasattr(melody, "note_params"):
        save_params(os.path.join(ckpt_dir, "melody_notes"), melody.note_params)
        save_params(os.path.join(ckpt_dir, "melody_duration"),
                    melody.duration_params)


def load_pipeline(ckpt_dir: str, song_synthesizer) -> None:
    """Restore components in place (missing files are skipped)."""
    for sid, svs in song_synthesizer.synthesizers.items():
        p = os.path.join(ckpt_dir, f"svs_{sid}")
        if os.path.exists(p):
            svs.params = load_params(p, svs.params)
    melody = song_synthesizer.melody
    if hasattr(melody, "note_params"):
        p = os.path.join(ckpt_dir, "melody_notes")
        if os.path.exists(p):
            melody.note_params = load_params(p, melody.note_params)
        p = os.path.join(ckpt_dir, "melody_duration")
        if os.path.exists(p):
            melody.duration_params = load_params(p, melody.duration_params)
