"""Pure-Python byte-level BPE (GPT-2/RoBERTa style) — reference fallback engine.

The reference tokenizes with HF ``AutoTokenizer('FacebookAI/roberta-base')``
(reference main_pretraining.py:117, dataset.py:158-163), whose core is a Rust
byte-level BPE. This module is the portable engine; the C++ engine in
``bpe.cpp`` (loaded via ctypes) is the production path and must agree with it
bit-for-bit. Parity vs HF is asserted in tests/test_tokenizer.py.

Pipeline (GPT-2 semantics):
  1. Pre-tokenize with the GPT-2 regex pattern
     ``'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+``
     (implemented with ``unicodedata`` since ``re`` lacks \\p classes).
  2. Map each pre-token's UTF-8 bytes through the byte→unicode table.
  3. Greedy lowest-rank pair merging against merges.txt ranks.
  4. Vocab lookup; unknown symbols map to ``unk_token``.
"""

from __future__ import annotations

import json
import unicodedata
from functools import lru_cache
from typing import Dict, Iterable, List, Sequence, Tuple


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2 byte→unicode mapping: printable bytes map to themselves, the rest
    to 256+n, yielding a reversible 256-symbol alphabet with no whitespace."""
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


def _is_letter(ch: str) -> bool:
    return unicodedata.category(ch).startswith("L")


def _is_number(ch: str) -> bool:
    return unicodedata.category(ch).startswith("N")


def pretokenize(text: str) -> List[str]:
    """Split text per the GPT-2 regex (letters/numbers/punct runs with optional
    leading space, apostrophe contractions, trailing-whitespace handling)."""
    tokens: List[str] = []
    i, n = 0, len(text)
    contractions = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")
    while i < n:
        ch = text[i]
        if ch == "'":
            matched = None
            for c in contractions:
                if text.startswith(c, i):
                    matched = c
                    break
            if matched:
                tokens.append(matched)
                i += len(matched)
                continue
        # ` ?\p{L}+` / ` ?\p{N}+` / ` ?[^\s\p{L}\p{N}]+`
        j = i
        prefix = ""
        if ch == " " and i + 1 < n and not text[i + 1].isspace():
            prefix = " "
            j = i + 1
            ch = text[j]
        if not ch.isspace():
            if _is_letter(ch):
                k = j
                while k < n and _is_letter(text[k]):
                    k += 1
            elif _is_number(ch):
                k = j
                while k < n and _is_number(text[k]):
                    k += 1
            else:
                # NB: apostrophes are consumed by the punct run; the contraction
                # alternatives only win when the match starts at the apostrophe.
                k = j
                while k < n and not (
                    text[k].isspace() or _is_letter(text[k]) or _is_number(text[k])
                ):
                    k += 1
            tokens.append(prefix + text[j:k])
            i = k
            continue
        # `\s+(?!\S)` (whitespace not followed by non-space) or `\s+`
        k = i
        while k < n and text[k].isspace():
            k += 1
        if k < n and k - i > 1:
            # leave one space to attach to the next token (the (?!\S) lookahead)
            tokens.append(text[i:k - 1])
            i = k - 1
        else:
            tokens.append(text[i:k])
            i = k
    return tokens


class BPEEngine:
    """Greedy pair-merge engine over the byte-unicode alphabet."""

    def __init__(self, vocab: Dict[str, int], merges: Sequence[Tuple[str, str]],
                 unk_token: str = "<unk>"):
        self.vocab = dict(vocab)
        self.bpe_ranks = {pair: i for i, pair in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.unk_id = self.vocab.get(unk_token, 0)
        self.id_to_token = {i: t for t, i in self.vocab.items()}
        self._cache: Dict[str, List[str]] = {}

    def bpe(self, token: str) -> List[str]:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word: List[str] = list(token)
        if len(word) == 1:
            self._cache[token] = word
            return word
        while True:
            best_rank = None
            best_pair = None
            prev = word[0]
            for cur in word[1:]:
                rank = self.bpe_ranks.get((prev, cur))
                if rank is not None and (best_rank is None or rank < best_rank):
                    best_rank, best_pair = rank, (prev, cur)
                prev = cur
            if best_pair is None:
                break
            first, second = best_pair
            merged: List[str] = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
            if len(word) == 1:
                break
        self._cache[token] = word
        return word

    def encode_text(self, text: str) -> List[int]:
        ids: List[int] = []
        for pre in pretokenize(text):
            mapped = "".join(self.byte_encoder[b] for b in pre.encode("utf-8"))
            for sym in self.bpe(mapped):
                ids.append(self.vocab.get(sym, self.unk_id))
        return ids

    def decode_ids(self, ids: Iterable[int]) -> str:
        text = "".join(self.id_to_token.get(i, "") for i in ids)
        data = bytes(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return data.decode("utf-8", errors="replace")


def load_vocab_merges(vocab_file: str, merges_file: str):
    with open(vocab_file, encoding="utf-8") as f:
        vocab = json.load(f)
    merges: List[Tuple[str, str]] = []
    with open(merges_file, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#version"):
                continue
            a, _, b = line.partition(" ")
            merges.append((a, b))
    return vocab, merges
