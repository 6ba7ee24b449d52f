from .api import MelodyGenerator, handle_durations, handle_notes
from .beam import beam_search
from .transformer import (MelodyConfig, MelodyTransformer, MSEDurationModel,
                          PostNormEncoder, SDPDurationConfig, SDPDurationModel,
                          causal_mask, sinusoidal_position_encoding)
from .beam import sample_decode
from .seq2seq import Lang, Seq2SeqConfig, Seq2SeqModel, beam_decode
from .telemelody import (TeleMelodyGenerator, TeleMelodyResult, adapt,
                         adapt_e, process_lyrics)
from .seq2seq_api import Seq2SeqMelodyGenerator, default_langs
from .vocab import (BOS_ID, EOS_ID, PAD_ID, UNK_ID, MelodyDictionary,
                    lyric_dictionary_from_chars, note_dictionary)

__all__ = [
    "MelodyGenerator", "handle_notes", "handle_durations", "beam_search",
    "MelodyConfig", "MelodyTransformer", "MSEDurationModel", "SDPDurationModel",
    "SDPDurationConfig", "PostNormEncoder", "causal_mask",
    "sinusoidal_position_encoding", "MelodyDictionary", "note_dictionary",
    "lyric_dictionary_from_chars", "PAD_ID", "UNK_ID", "BOS_ID", "EOS_ID",
]
