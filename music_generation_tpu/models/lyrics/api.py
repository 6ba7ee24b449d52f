"""Host-level lyric generation API.

Parity surfaces:
  - GPT-2: Lyric_generator/generator.py:23-51 — prompt
    "[CLS] title [SEP] <style> [SEP]", greedy w/ bigram ban, post-split on
    <结束> then join [SEP] segments with '，'.
  - T5: Lyric_generator_t5/generator.py:21-35 — prompt
    "关键词：{kw} 长度：15", top-k 10 sampling.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .gpt2 import GPT2, GPT2Config, greedy_generate
from .t5 import T5, T5Config, topk_sample_generate
from .tokenizer import EOS, SEP, STYLE_TOKENS, CharTokenizer

GPT2_MAX_LENGTH = 90
T5_MAX_LENGTH = 128  # reference passes 512 but lyric outputs are ~100 chars
T5_TOP_K = 10


class LyricGeneratorGPT2:
    def __init__(self, cfg: Optional[GPT2Config] = None, params=None,
                 tokenizer: Optional[CharTokenizer] = None, seed: int = 0):
        self.tokenizer = tokenizer or CharTokenizer()
        self.cfg = cfg or GPT2Config(vocab_size=self.tokenizer.vocab_size)
        self.model = GPT2(self.cfg)
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 8), jnp.int32))
        self.params = params

    def generate(self, title: str, style: str = "<Pop 流行>") -> str:
        tok = self.tokenizer
        prompt = ([tok.cls_id] + tok.encode(title) + [tok.sep_id]
                  + [tok.token_id(style)] + [tok.sep_id])
        buf = np.full((1, GPT2_MAX_LENGTH), tok.pad_id, np.int32)
        buf[0, : len(prompt)] = prompt
        tokens = greedy_generate(self.model, self.params, jnp.asarray(buf),
                                 jnp.asarray([len(prompt)]),
                                 max_length=GPT2_MAX_LENGTH)
        text = "".join(tok.tokens[i] for i in np.asarray(tokens[0]))
        # reference post-processing: cut at <结束>, drop the prompt segments,
        # join the remaining [SEP] segments with '，'
        text = text.split(EOS)[0]
        segs = text.split(SEP)
        return "，".join(segs[2:-1]).replace(" ", "").replace("[PAD]", "")


class LyricGeneratorT5:
    TITLE_PROMPT = "关键词："
    LENGTH_PROMPT = "长度："

    def __init__(self, cfg: Optional[T5Config] = None, params=None,
                 tokenizer: Optional[CharTokenizer] = None, seed: int = 0):
        self.tokenizer = tokenizer or CharTokenizer()
        self.cfg = cfg or T5Config(vocab_size=self.tokenizer.vocab_size)
        self.model = T5(self.cfg)
        if params is None:
            src = jnp.zeros((1, 8), jnp.int32)
            params = self.model.init(jax.random.PRNGKey(seed), src,
                                     jnp.ones((1, 8), jnp.int32),
                                     jnp.zeros((1, 4), jnp.int32))
        self.params = params
        self._rng = jax.random.PRNGKey(seed + 1)

    def generate(self, keyword: str, length: int = 15) -> str:
        tok = self.tokenizer
        prompt = f"{self.TITLE_PROMPT}{keyword} {self.LENGTH_PROMPT}{length}"
        ids = tok.encode(prompt)
        src = jnp.asarray([ids], jnp.int32)
        mask = jnp.ones_like(src)
        self._rng, sub = jax.random.split(self._rng)
        out = topk_sample_generate(self.model, self.params, sub, src, mask,
                                   max_length=T5_MAX_LENGTH, top_k=T5_TOP_K)
        ids_out = np.asarray(out[0]).tolist()
        if self.cfg.eos_token_id in ids_out:
            ids_out = ids_out[: ids_out.index(self.cfg.eos_token_id)]
        ids_out = [i for i in ids_out if i != self.cfg.pad_token_id]
        return tok.decode(ids_out, skip_special=True)
