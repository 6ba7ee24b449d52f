"""Import reference PyTorch VISinger checkpoints into this framework.

Maps a `SynthesizerTrn` state_dict (VISinger/models.py / models_ae.py) onto
the flax `VISinger` parameter tree, handling layout conversion:
  - Conv1d   [out, in, k]  -> [k, in, out]
  - ConvT1d  [in, out, k]  -> [k, in, out] with kernel flipped along k
  - Linear   [out, in]     -> [in, out]
  - weight-norm layers: the torch (g, v) pair is collapsed to the effective
    weight; our reparam stores (kernel=w_eff, g=||w_eff||) which reproduces
    w_eff exactly.
Missing / shape-mismatched keys are skipped with a warning — the same
tolerant partial-load contract as the reference's load_checkpoint
(VISinger/utils/utils.py:33-58).
"""

from __future__ import annotations

import logging
from typing import Callable

import numpy as np

logger = logging.getLogger(__name__)


def _conv(w):          # [out, in, k] -> [k, in, out]
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def _convT(w):         # [in, out, k] -> [k, in, out], flipped in k
    return np.ascontiguousarray(np.transpose(w, (2, 0, 1))[::-1])


def _linear(w):        # [out, in] -> [in, out]
    return np.ascontiguousarray(np.transpose(w))


def _ident(w):
    return np.asarray(w)


def _effective_weight(sd, prefix):
    """Collapse torch weight-norm (weight_g, weight_v) to the effective
    weight; falls back to plain `weight`."""
    if f"{prefix}.weight_v" in sd:
        v = np.asarray(sd[f"{prefix}.weight_v"], np.float32)
        g = np.asarray(sd[f"{prefix}.weight_g"], np.float32)
        axes = tuple(range(1, v.ndim))
        norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
        return g * v / np.maximum(norm, 1e-12)
    return np.asarray(sd[f"{prefix}.weight"], np.float32)


def _set(params, path, value):
    node = params
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


class _Mapper:
    def __init__(self, state_dict):
        self.sd = {k: np.asarray(v.detach().cpu().numpy()
                                 if hasattr(v, "detach") else v, np.float32)
                   for k, v in state_dict.items()}
        self.params: dict = {}
        self.used: set = set()

    def copy(self, torch_key, flax_path, transform=_ident):
        if torch_key not in self.sd:
            logger.warning("missing torch key: %s", torch_key)
            return
        _set(self.params, flax_path, transform(self.sd[torch_key]))
        self.used.add(torch_key)

    def conv(self, tprefix, fpath, bias=True, weight_norm=False):
        """Any 1-D conv (plain or weight-normed) -> my Conv1d params."""
        if weight_norm or f"{tprefix}.weight_v" in self.sd:
            w = _conv(_effective_weight(self.sd, tprefix))
            _set(self.params, fpath + ("kernel",), w)
            _set(self.params, fpath + ("g",),
                 np.linalg.norm(w.reshape(-1, w.shape[-1]), axis=0))
            self.used.update({f"{tprefix}.weight_v", f"{tprefix}.weight_g"}
                             & set(self.sd))
        else:
            self.copy(f"{tprefix}.weight", fpath + ("kernel",), _conv)
        if bias and f"{tprefix}.bias" in self.sd:
            self.copy(f"{tprefix}.bias", fpath + ("bias",))

    def convT(self, tprefix, fpath):
        w = _convT(_effective_weight(self.sd, tprefix))
        _set(self.params, fpath + ("kernel",), w)
        _set(self.params, fpath + ("g",),
             np.linalg.norm(w.reshape(-1, w.shape[-1]), axis=0))
        self.used.update({f"{tprefix}.weight_v", f"{tprefix}.weight_g",
                          f"{tprefix}.weight"} & set(self.sd))
        if f"{tprefix}.bias" in self.sd:
            self.copy(f"{tprefix}.bias", fpath + ("bias",))

    def norm(self, tprefix, fpath):
        self.copy(f"{tprefix}.gamma", fpath + ("LayerNorm_0", "scale"))
        self.copy(f"{tprefix}.beta", fpath + ("LayerNorm_0", "bias"))

    def embed(self, tkey, fpath):
        self.copy(tkey, fpath + ("embedding",))

    def encoder_stack(self, tprefix, fpath, n_layers):
        """attentions.Encoder -> core.attention.TransformerEncoder."""
        for i in range(n_layers):
            a = fpath + (f"attn_{i}",)
            t = f"{tprefix}.attn_layers.{i}"
            for name in ("q", "k", "v"):
                self.conv(f"{t}.conv_{name}", a + (name,))
            self.conv(f"{t}.conv_o", a + ("out",))
            self.copy(f"{t}.emb_rel_k", a + ("emb_rel_k",))
            self.copy(f"{t}.emb_rel_v", a + ("emb_rel_v",))
            self.norm(f"{tprefix}.norm_layers_1.{i}", fpath + (f"norm1_{i}",))
            self.norm(f"{tprefix}.norm_layers_2.{i}", fpath + (f"norm2_{i}",))
            f = fpath + (f"ffn_{i}",)
            self.conv(f"{tprefix}.ffn_layers.{i}.conv_1", f + ("Conv1d_0",))
            self.conv(f"{tprefix}.ffn_layers.{i}.conv_2", f + ("Conv1d_1",))

    def wavenet(self, tprefix, fpath, n_layers):
        for i in range(n_layers):
            self.conv(f"{tprefix}.in_layers.{i}", fpath + (f"in_{i}",),
                      weight_norm=True)
            self.conv(f"{tprefix}.res_skip_layers.{i}",
                      fpath + (f"res_skip_{i}",), weight_norm=True)
        if f"{tprefix}.cond_layer.weight_v" in self.sd:
            self.conv(f"{tprefix}.cond_layer", fpath + ("cond",),
                      weight_norm=True)


def visinger_params_from_torch(state_dict, cfg) -> dict:
    """state_dict of SynthesizerTrn (models_ae or models) -> flax params."""
    m = _Mapper(state_dict)

    # --- text encoder -------------------------------------------------------
    te = ("text_encoder",)
    m.embed("text_encoder.emb_phoneme.weight", te + ("emb_phoneme",))
    m.embed("text_encoder.emb_note_pitch.weight", te + ("emb_note_pitch",))
    m.embed("text_encoder.emb_phone_shengdiao.weight", te + ("emb_shengdiao",))
    m.copy("text_encoder.emb_note_duration.weight",
           te + ("emb_note_duration", "kernel"), _linear)
    m.copy("text_encoder.emb_note_duration.bias",
           te + ("emb_note_duration", "bias"))
    m.encoder_stack("text_encoder.encoder", te + ("encoder",), cfg.n_layers)

    # --- duration predictor --------------------------------------------------
    dp = ("duration_predictor",)
    for i in range(3):
        m.conv(f"duration_predictor.conv_{i + 1}", dp + (f"conv_{i}",))
        m.norm(f"duration_predictor.norm_{i + 1}", dp + (f"norm_{i}",))
    m.conv("duration_predictor.proj", dp + ("proj",))

    # --- text post net --------------------------------------------------------
    tp = ("text_post_net",)
    m.embed("text_post_net.position_embeddings.weight",
            tp + ("position_embeddings",))
    m.embed("text_post_net.f0_emb.weight", tp + ("f0_emb",))
    m.encoder_stack("text_post_net.f0_predictor.encoder",
                    tp + ("f0_predictor", "encoder"), 6)
    m.conv("text_post_net.f0_predictor.output_layer",
           tp + ("f0_predictor", "out"))
    m.conv("text_post_net.mel_predict_net.condition_proj",
           tp + ("mel_predict_net", "condition_proj"))
    m.encoder_stack("text_post_net.mel_predict_net.encoder",
                    tp + ("mel_predict_net", "encoder"), 4)
    m.conv("text_post_net.mel_predict_net.output_layer",
           tp + ("mel_predict_net", "out"))
    m.conv("text_post_net.frame_prior_net.condition_proj",
           tp + ("frame_prior_net", "condition_proj"))
    for i in range(4):
        m.conv(f"text_post_net.frame_prior_net.conv_layers.{i}",
               tp + ("frame_prior_net", f"conv_{i}"))
    m.conv("text_post_net.proj", tp + ("proj",))

    # --- posterior encoder / flow / (AE) spec decoder -------------------------
    m.conv("spec_encoder.pre", ("spec_encoder", "pre"))
    m.wavenet("spec_encoder.enc", ("spec_encoder", "enc"), 16)
    m.conv("spec_encoder.proj", ("spec_encoder", "proj"))

    for i in range(4):
        t = f"spec_flow.spec_flows.{2 * i}"
        f = ("spec_flow", f"coupling_{i}")
        m.conv(f"{t}.pre", f + ("pre",))
        m.wavenet(f"{t}.enc", f + ("enc",), 4)
        m.conv(f"{t}.post", f + ("post",))

    if cfg.autoencoder:
        m.conv("spec_decoder.pre", ("spec_decoder", "pre"))
        m.wavenet("spec_decoder.enc", ("spec_decoder", "enc"), 16)
        m.conv("spec_decoder.proj", ("spec_decoder", "proj"))
        m.conv("spec_proj", ("spec_proj",))

    # --- HiFi-GAN decoder -------------------------------------------------------
    dec = ("decoder",)
    m.conv("decoder.conv_pre", dec + ("conv_pre",))
    n_k = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        m.convT(f"decoder.ups.{i}", dec + (f"up_{i}",))
        for j in range(n_k):
            t = f"decoder.resblocks.{i * n_k + j}"
            f = dec + (f"res_{i}_{j}",)
            if cfg.resblock == "1":
                for mm in range(3):
                    m.conv(f"{t}.convs1.{mm}", f + (f"conv1_{mm}",),
                           weight_norm=True)
                    m.conv(f"{t}.convs2.{mm}", f + (f"conv2_{mm}",),
                           weight_norm=True)
            else:
                for mm in range(2):
                    m.conv(f"{t}.convs.{mm}", f + (f"conv_{mm}",),
                           weight_norm=True)
    m.conv("decoder.conv_post", dec + ("conv_post",), bias=False)

    unused = set(m.sd) - m.used
    if unused:
        logger.info("unused torch keys (%d): %s", len(unused),
                    sorted(unused)[:8])
    return {"params": m.params}
