"""Shared CLI -> SVSConfig construction for the trainer and export/eval tools.

The trainer (train/__main__.py), the checkpoint exporter
(tools/export_trained_svs.py) and the sung-song evaluator
(tools/eval_sung_song.py) must all materialise the *same* SVSConfig for a
given (tiny, decoder, nsf) triple, or orbax restore fails on a tree
mismatch. Reference analogue: every entry point loads the same hps json
(/root/reference/VISinger/utils.py get_hparams_from_file).
"""

import dataclasses

from music_generation_tpu.models.svs import SVSConfig

#: decoder choices the train CLI accepts; istft variants are beyond-parity
#: speed options (models/svs/istft.py). NSF excitation is hifigan-only
#: (models/svs/visinger.py decoder wiring).
DECODERS = ("hifigan", "istft", "mb_istft")


def build_svs_config(tiny: bool = False, decoder: str = "hifigan",
                     nsf: bool = False,
                     f0_residual: bool = False) -> SVSConfig:
    """One SVSConfig for trainer + tools; raises on invalid combinations."""
    if decoder not in DECODERS:
        raise ValueError(f"decoder must be one of {DECODERS}, got {decoder!r}")
    if nsf and decoder != "hifigan":
        raise ValueError("--nsf requires --decoder hifigan (NSF excitation "
                         "is wired into the HiFi-GAN upsample stack only)")
    if tiny:
        cfg = SVSConfig(
            inter_channels=16, hidden_channels=16, filter_channels=32,
            n_heads=2, n_layers=1, spec_channels=65,
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
            upsample_rates=(4, 4), upsample_initial_channel=32,
            upsample_kernel_sizes=(8, 8), segment_size=16 * 8, hop_length=16)
    else:
        cfg = SVSConfig()
    if decoder != "hifigan":
        if tiny:
            # tiny hop=16: istft 4*4=16; mb_istft 2*4*2=16
            extra = (dict(istft_upsample_rates=(4,),
                          istft_upsample_kernel_sizes=(8,))
                     if decoder == "istft" else
                     dict(mb_upsample_rates=(2,),
                          mb_upsample_kernel_sizes=(4,), mb_subbands=2))
            cfg = dataclasses.replace(cfg, decoder_type=decoder, **extra)
        else:
            cfg = dataclasses.replace(cfg, decoder_type=decoder)
    if nsf:
        cfg = dataclasses.replace(cfg, nsf=True)
    if f0_residual:
        cfg = dataclasses.replace(cfg, f0_residual=True)
    return cfg


def tool_shapes(tiny: bool) -> tuple[int, int]:
    """(t_phones, t_frames) the trainer pads batches to — tools must match."""
    return (8, 32) if tiny else (64, 480)
