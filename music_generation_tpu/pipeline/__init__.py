from .synthesis import (SVSSynthesizer, SongResult, SongSynthesizer,
                        build_default_song_synthesizer, split_sentences)

__all__ = ["SVSSynthesizer", "SongSynthesizer", "SongResult",
           "build_default_song_synthesizer", "split_sentences"]
