"""Byte-level BPE tokenizer with RoBERTa post-processing.

Replaces the reference's HF AutoTokenizer usage (reference dataset.py:158-165:
``tokenizer(text, max_length=N, padding='max_length', truncation=True)``).
The merge engine is native C++ (bpe.cpp via ctypes, compiled on first use and
cached next to the source); a pure-Python engine (bpe_py.py) is the fallback
and the parity oracle.

Vocabulary files are standard HF ``vocab.json``/``merges.txt`` (e.g. from
roberta-base). Special-token conventions follow RoBERTa:
``<s>=bos=0, <pad>=1, </s>=eos=2, <unk>=3``; single-sequence encoding is
``<s> tokens </s>`` with truncation to max_length-2 interior tokens.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from synergy_tpu.data.tokenizer.bpe_py import BPEEngine, load_vocab_merges

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_SRC_DIR, "libbpe.so")


def _build_native() -> Optional[str]:
    """Compile bpe.cpp into libbpe.so next to the source (one-time, cached)."""
    src = os.path.join(_SRC_DIR, "bpe.cpp")
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", src, "-o", _LIB_PATH],
            check=True, capture_output=True, cwd=_SRC_DIR,
        )
        return _LIB_PATH
    except (OSError, subprocess.CalledProcessError):
        return None


class _NativeEngine:
    def __init__(self, vocab_file: str, merges_file: str):
        lib_path = _build_native()
        if lib_path is None:
            raise RuntimeError("native BPE build failed")
        lib = ctypes.CDLL(lib_path)
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.bpe_destroy.argtypes = [ctypes.c_void_p]
        lib.bpe_encode.restype = ctypes.c_int32
        lib.bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        handle = lib.bpe_create(vocab_file.encode(), merges_file.encode())
        if not handle:
            raise RuntimeError(f"bpe_create failed for {vocab_file}")
        self._lib, self._handle = lib, handle
        self._buf_size = 4096
        self._buf = (ctypes.c_int32 * self._buf_size)()
        # The output buffer is shared across calls; serving dispatches
        # concurrent requests into one engine, so serialize encode calls.
        self._lock = threading.Lock()

    def encode_text(self, text: str) -> List[int]:
        data = text.encode("utf-8")
        with self._lock:
            n = self._lib.bpe_encode(
                self._handle, data, len(data), self._buf, self._buf_size)
            if n > self._buf_size:
                self._buf_size = max(n, self._buf_size * 2)
                self._buf = (ctypes.c_int32 * self._buf_size)()
                n = self._lib.bpe_encode(
                    self._handle, data, len(data), self._buf, self._buf_size)
            return list(self._buf[:n])

    def __del__(self):
        try:
            self._lib.bpe_destroy(self._handle)
        except Exception:
            pass


class ByteLevelBPETokenizer:
    """RoBERTa-compatible tokenizer over vocab.json/merges.txt files."""

    def __init__(self, vocab_file: str, merges_file: str, backend: str = "auto"):
        vocab, merges = load_vocab_merges(vocab_file, merges_file)
        self.vocab = vocab
        self.bos_token_id = vocab.get("<s>", 0)
        self.pad_token_id = vocab.get("<pad>", 1)
        self.eos_token_id = vocab.get("</s>", 2)
        self.unk_token_id = vocab.get("<unk>", 3)
        self.vocab_size = max(vocab.values()) + 1
        self._py = BPEEngine(vocab, merges)
        self._native = None
        if backend in ("auto", "native"):
            try:
                self._native = _NativeEngine(vocab_file, merges_file)
            except RuntimeError:
                if backend == "native":
                    raise
        self.backend = "native" if self._native is not None else "python"

    def encode_raw(self, text: str) -> List[int]:
        """BPE ids without special tokens."""
        engine = self._native if self._native is not None else self._py
        return engine.encode_text(text)

    @staticmethod
    def _truncate_longest_first(
        ids_a: List[int], ids_b: List[int], budget: int
    ) -> "tuple[List[int], List[int]]":
        """HF LongestFirst truncation: drop one token at a time from the end of
        the longer sequence; ties drop from the second sequence (matches both
        transformers' slow ``truncate_sequences`` and the Rust tokenizer)."""
        budget = max(budget, 0)
        total = len(ids_a) + len(ids_b)
        if total <= budget:
            return ids_a, ids_b
        ids_a, ids_b = list(ids_a), list(ids_b)
        for _ in range(total - budget):
            if len(ids_a) > len(ids_b):
                ids_a.pop()
            else:
                ids_b.pop()
        return ids_a, ids_b

    def encode(
        self,
        text: str,
        text_pair: Optional[str] = None,
        max_length: Optional[int] = None,
    ) -> List[int]:
        """``<s> A </s>`` or, with ``text_pair``, RoBERTa's pair layout
        ``<s> A </s></s> B </s>`` with real special-token ids and HF
        longest-first truncation (reference DT/FT_text_task.py:113-240 feeds
        GLUE sentence pairs through ``tokenizer(a, b, truncation=True, ...)``)."""
        ids = self.encode_raw(text)
        if text_pair is None:
            if max_length is not None:
                ids = ids[: max_length - 2]
            return [self.bos_token_id] + ids + [self.eos_token_id]
        ids_b = self.encode_raw(text_pair)
        if max_length is not None:
            ids, ids_b = self._truncate_longest_first(ids, ids_b, max_length - 4)
        return ([self.bos_token_id] + ids + [self.eos_token_id, self.eos_token_id]
                + ids_b + [self.eos_token_id])

    def __call__(
        self,
        texts: Union[str, Sequence[str]],
        text_pair: Union[str, Sequence[str], None] = None,
        max_length: int = 32,
        padding: str = "max_length",
        truncation: bool = True,
    ) -> Dict[str, np.ndarray]:
        """Batch-encode to fixed (len(texts), max_length) int32 arrays, matching
        HF's ``padding='max_length', truncation=True`` semantics. ``text_pair``
        (parallel to ``texts``) selects the two-sequence GLUE layout."""
        if isinstance(texts, str):
            texts = [texts]
        if isinstance(text_pair, str):
            text_pair = [text_pair]
        if text_pair is not None and len(text_pair) != len(texts):
            raise ValueError("text_pair must be parallel to texts")
        batch = []
        for i, t in enumerate(texts):
            ids = self.encode(
                t, text_pair=text_pair[i] if text_pair is not None else None,
                max_length=max_length if truncation else None)
            batch.append(ids)
        if padding == "max_length":
            width = max_length
        else:
            width = max(len(x) for x in batch)
        input_ids = np.full((len(batch), width), self.pad_token_id, dtype=np.int32)
        attention_mask = np.zeros((len(batch), width), dtype=np.int32)
        for i, ids in enumerate(batch):
            ids = ids[:width]
            input_ids[i, : len(ids)] = ids
            attention_mask[i, : len(ids)] = 1
        return {"input_ids": input_ids, "attention_mask": attention_mask}

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        if skip_special_tokens:
            special = {self.bos_token_id, self.eos_token_id, self.pad_token_id}
            ids = [i for i in ids if i not in special]
        return self._py.decode_ids(ids)
