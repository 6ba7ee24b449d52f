"""Core TPU-friendly neural building blocks (flax, channels-last)."""

from .attention import RelativeMultiHeadAttention, TransformerEncoder
from .flows import (ConvFlow, ElementwiseAffine, LogFlow, ResidualCouplingBlock,
                    ResidualCouplingLayer, flip)
from .layers import (LRELU_SLOPE, Conv1d, ConvReluNorm, ConvTranspose1d, DDSConv,
                     FFN, LayerNorm1d)
from .masking import (expand_by_durations, feature_mask, generate_path,
                      rand_slice_segments, sequence_mask, slice_segments)
from .splines import piecewise_rational_quadratic_transform
from .wavenet import WaveNet

__all__ = [
    "RelativeMultiHeadAttention", "TransformerEncoder", "ConvFlow",
    "ElementwiseAffine", "LogFlow", "ResidualCouplingBlock",
    "ResidualCouplingLayer", "flip", "Conv1d", "ConvTranspose1d", "ConvReluNorm",
    "DDSConv", "FFN", "LayerNorm1d", "LRELU_SLOPE", "expand_by_durations",
    "feature_mask", "generate_path", "rand_slice_segments", "sequence_mask",
    "slice_segments", "piecewise_rational_quadratic_transform", "WaveNet",
]
