"""CLIP BPE tokenizer — pure Python, no external tokenizer dependency.

Loads ``vocab.json`` + ``merges.txt`` from a checkpoint's ``tokenizer/``
subfolder (the diffusers layout the reference consumes via HF CLIPTokenizer,
SURVEY.md D14).  Algorithm: byte-level BPE with the CLIP end-of-word marker
``</w>``, lowercased, whitespace-normalized, with the CLIP regex split.

The empty prompt encodes to [bos, eos] — the [1, 2, D] empty-text embedding
path (/root/reference/rollingdepth/rollingdepth_pipeline.py:178-191).
"""

from __future__ import annotations

import json
import os
import re
from functools import lru_cache
from typing import Dict, List, Optional, Tuple


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2/CLIP reversible byte->unicode map."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word: Tuple[str, ...]):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class CLIPTokenizer:
    """Minimal CLIP tokenizer matching HF CLIPTokenizer behavior."""

    def __init__(self, vocab: Dict[str, int], merges: List[Tuple[str, str]],
                 model_max_length: int = 77):
        self.encoder = vocab
        self.decoder = {v: k for k, v in vocab.items()}
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.cache: Dict[str, str] = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.model_max_length = model_max_length
        self.bos_token_id = vocab.get("<|startoftext|>")
        self.eos_token_id = vocab.get("<|endoftext|>")
        # HF CLIPTokenizer pre-tokenizes with the `regex` package pattern
        # [\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+ — letters-only runs, single
        # number chars, punctuation runs (incl. '_').  A plain \w+|\d split
        # diverges on letter-digit mixes ("4k", "room2") and underscores,
        # giving different BPE ids and silently different prompt embeddings.
        try:
            import regex

            self.pat = regex.compile(
                r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
                r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
                regex.IGNORECASE,
            )
        except ImportError:  # stdlib approximation of the \p classes
            self.pat = re.compile(
                r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
                r"|[^\W\d_]+|\d|[^\s\w]+|_+",
                re.IGNORECASE | re.UNICODE,
            )

    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(cls, model_dir: str, subfolder: Optional[str] = "tokenizer") -> "CLIPTokenizer":
        d = os.path.join(model_dir, subfolder) if subfolder else model_dir
        with open(os.path.join(d, "vocab.json"), encoding="utf-8") as f:
            vocab = json.load(f)
        with open(os.path.join(d, "merges.txt"), encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [tuple(line.split()) for line in lines[1 : 49152 - 256 - 2 + 1] if line.split()]
        max_len = 77
        cfg_path = os.path.join(d, "tokenizer_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                max_len = json.load(f).get("model_max_length", 77)
        return cls(vocab, merges, model_max_length=max_len)

    # ------------------------------------------------------------------
    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def tokenize_ids(self, text: str) -> List[int]:
        """Raw BPE ids without special tokens."""
        text = whitespace_clean(text).lower()
        ids: List[int] = []
        for token in self.pat.findall(text):
            token_bytes = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            for bpe_tok in self.bpe(token_bytes).split(" "):
                ids.append(self.encoder[bpe_tok])
        return ids

    def __call__(
        self,
        text: str,
        padding: str = "do_not_pad",
        max_length: Optional[int] = None,
        truncation: bool = True,
    ) -> List[int]:
        """Encode with bos/eos; mirrors HF CLIPTokenizer(text).input_ids."""
        max_length = max_length or self.model_max_length
        ids = self.tokenize_ids(text)
        if truncation and len(ids) > max_length - 2:
            ids = ids[: max_length - 2]
        out = [self.bos_token_id] + ids + [self.eos_token_id]
        if padding == "max_length":
            out = out + [self.eos_token_id] * (max_length - len(out))
        return out
