from .hifigan import (DiscriminatorP, DiscriminatorS, Generator,
                      MultiPeriodDiscriminator, ResBlock1, ResBlock2)
from .visinger import (SVSConfig, SpecDecoder, TextEncoder, TextPostNet,
                       PosteriorEncoder, VISinger, f0_to_coarse)

__all__ = [
    "Generator", "MultiPeriodDiscriminator", "DiscriminatorP", "DiscriminatorS",
    "ResBlock1", "ResBlock2", "SVSConfig", "VISinger", "TextEncoder",
    "TextPostNet", "PosteriorEncoder", "SpecDecoder", "f0_to_coarse",
]
