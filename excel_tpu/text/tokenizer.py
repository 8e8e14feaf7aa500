"""CLIP byte-pair-encoding tokenizer.

Clean-room reimplementation of the OpenAI CLIP tokenizer semantics used by the
reference (see /root/reference/clip/simple_tokenizer.py:62-132 and
clip/clip.py:209-249 for the behavior being matched):

- byte-level BPE over the public 16e6 merge table (assets/bpe_merges.txt.gz),
  first 48894 merges, vocab = 256 bytes + 256 byte+'</w>' + merges + 2 specials
- text normalization: double html-unescape, whitespace collapse, lowercase
  (the reference additionally runs ftfy.fix_text, which is the identity on the
  ASCII prompt strings this system feeds it)
- context length 77, <|startoftext|> / <|endoftext|> framing, optional
  truncation that overwrites the last slot with the EOT id
"""
from __future__ import annotations

import functools
import gzip
import html
import os
import re

import numpy as np
import regex

CONTEXT_LENGTH = 77

_WORD_RE = regex.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
    regex.IGNORECASE,
)


def _default_merges_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "assets", "bpe_merges.txt.gz")


@functools.lru_cache()
def _byte_to_unicode() -> dict[int, str]:
    """Invertible byte -> printable-unicode map (standard byte-level BPE trick)."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    mapping = {b: chr(b) for b in printable}
    offset = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + offset)
            offset += 1
    return mapping


def _normalize(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text).strip()
    return text.lower()


class ClipTokenizer:
    """Encodes text to CLIP BPE token ids identical to the reference tokenizer."""

    def __init__(self, merges_path: str | None = None):
        merges_path = merges_path or _default_merges_path()
        with gzip.open(merges_path, "rt", encoding="utf-8") as f:
            merge_lines = [ln for ln in f.read().split("\n") if ln]
        merges = [tuple(ln.split()) for ln in merge_lines]

        b2u = _byte_to_unicode()
        self._b2u = b2u
        base = list(b2u.values())
        vocab = base + [tok + "</w>" for tok in base]
        vocab += ["".join(pair) for pair in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.token_to_id = {tok: i for i, tok in enumerate(vocab)}
        self.id_to_token = {i: tok for tok, i in self.token_to_id.items()}
        self._rank = {pair: i for i, pair in enumerate(merges)}
        self._cache: dict[str, tuple[str, ...]] = {}

        self.sot = self.token_to_id["<|startoftext|>"]
        self.eot = self.token_to_id["<|endoftext|>"]
        self.vocab_size = len(vocab)

    def _apply_bpe(self, piece: str) -> tuple[str, ...]:
        cached = self._cache.get(piece)
        if cached is not None:
            return cached
        symbols = list(piece[:-1]) + [piece[-1] + "</w>"]
        while len(symbols) > 1:
            pairs = [(symbols[i], symbols[i + 1]) for i in range(len(symbols) - 1)]
            best = min(pairs, key=lambda p: self._rank.get(p, float("inf")))
            if best not in self._rank:
                break
            merged: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i < len(symbols) - 1
                    and symbols[i] == best[0]
                    and symbols[i + 1] == best[1]
                ):
                    merged.append(best[0] + best[1])
                    i += 2
                else:
                    merged.append(symbols[i])
                    i += 1
            symbols = merged
        result = tuple(symbols)
        self._cache[piece] = result
        return result

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for word in _WORD_RE.findall(_normalize(text)):
            if word in ("<|startoftext|>", "<|endoftext|>"):
                ids.append(self.token_to_id[word])
                continue
            piece = "".join(self._b2u[b] for b in word.encode("utf-8"))
            ids.extend(self.token_to_id[s] for s in self._apply_bpe(piece))
        return ids

    def decode(self, ids) -> str:
        u2b = {u: b for b, u in self._b2u.items()}
        text = "".join(self.id_to_token[int(i)] for i in ids)
        data = bytearray(u2b[c] for c in text if c in u2b)
        return data.decode("utf-8", errors="replace").replace("</w>", " ")


@functools.lru_cache()
def get_tokenizer(merges_path: str | None = None) -> ClipTokenizer:
    return ClipTokenizer(merges_path)


def tokenize(
    texts: str | list[str],
    context_length: int = CONTEXT_LENGTH,
    truncate: bool = False,
) -> np.ndarray:
    """Batch-tokenize to a fixed [n, context_length] int32 array.

    Matches the reference's clip.tokenize (clip/clip.py:209-249): SOT + ids +
    EOT, zero padding, and on overflow either truncate (forcing EOT into the
    final slot) or raise.
    """
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer()
    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for row, text in enumerate(texts):
        ids = [tok.sot] + tok.encode(text) + [tok.eot]
        if len(ids) > context_length:
            if not truncate:
                raise RuntimeError(
                    f"Input {text!r} is too long for context length {context_length}"
                )
            ids = ids[:context_length]
            ids[-1] = tok.eot
        out[row, : len(ids)] = ids
    return out
