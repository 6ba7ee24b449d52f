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
    load_checkpoint (VISinger/utils.py:20-38): per-leaf, take the saved
    value when present and shape-compatible, else keep the target's
    initialization. Tolerance matters in practice: a trainer checkpoint
    exported by tools/export_trained_svs.py carries training-only modules
    (spec_encoder, ...) the inference-initialized tree lacks, and vice
    versa a structural mismatch must degrade to init, not crash serving."""
    import logging

    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(os.path.abspath(path), target)
    except ValueError:
        pass  # tree mismatch -> tolerant merge below
    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    stats = {"restored": 0, "kept": 0, "extra": 0}

    def merge(tgt, src):
        if isinstance(tgt, dict):
            src = src if isinstance(src, dict) else {}
            stats["extra"] += sum(1 for k in src if k not in tgt)
            return {k: merge(v, src.get(k)) for k, v in tgt.items()}
        if (src is not None and not isinstance(src, dict)
                and getattr(src, "shape", None) == tgt.shape):
            import jax.numpy as jnp
            stats["restored"] += 1
            return jnp.asarray(src, dtype=tgt.dtype)
        stats["kept"] += 1
        return tgt

    out = merge(target, raw)
    logging.getLogger("music_generation_tpu").warning(
        "tolerant restore from %s: %d leaves restored, %d kept at init, "
        "%d on-disk subtrees unused", path, stats["restored"], stats["kept"],
        stats["extra"])
    return out


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
