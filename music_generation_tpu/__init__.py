"""music_generation_tpu — TPU-native Chinese song-generation framework.

Rebuild of GuluOfficial/music_generation as idiomatic JAX/XLA: G2P frontend,
lyric LMs (GPT-2 / T5), melody transformers (MSE / SDP duration variants),
VISinger SVS (VITS-derived, AE variant), HTTP serving, pjit GAN training.
"""

__version__ = "0.1.0"
