"""Tokenizer parity: our C++ and Python byte-level BPE engines vs HF RoBERTa.

The real roberta-base vocab cannot be downloaded in this environment, so we
train a small byte-level BPE with the HF `tokenizers` trainer on a mixed corpus
and require exact token-id agreement on a battery of strings, including the
prompt-template domain the reference feeds through AutoTokenizer
(reference dataset.py:158-165).
"""

import json

import numpy as np
import pytest

from synergy_tpu.data.templates import TEMPLATES
from synergy_tpu.data.tokenizer import ByteLevelBPETokenizer
from synergy_tpu.data.tokenizer.bpe_py import BPEEngine, load_vocab_merges, pretokenize

LABELS = [
    "dog barking", "playing violin", "church bells", "rain", "sea waves",
    "fireworks", "driving motorcycle", "people sobbing", "cat purring",
]

TRICKY = [
    "hello world",
    "  leading and   multiple spaces",
    "trailing space ",
    "don't stop, it's fine — we'll see; they've gone.",
    "numbers 123 and 3.14159!",
    "CamelCase and UPPER lower",
    "punct!!! ??? ...'s weird 'twas",
    "tabs\tand\nnewlines\r\nmixed",
    "unicode: naïve café über 東京 🎵 música",
    "a photo and sound of playing violin.",
    "",
    " ",
    "'s",
    "x",
    "it's!!!'s",
    "word'?!",
]


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    from tokenizers import ByteLevelBPETokenizer as HFTrainer

    corpus = [t.format(l) for t in TEMPLATES for l in LABELS] + TRICKY * 5
    d = tmp_path_factory.mktemp("bpe")
    corpus_path = d / "corpus.txt"
    corpus_path.write_text("\n".join(c for c in corpus if c.strip()))
    trainer = HFTrainer()
    trainer.train(
        [str(corpus_path)], vocab_size=800, min_frequency=1,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"],
    )
    trainer.save_model(str(d))
    return str(d / "vocab.json"), str(d / "merges.txt")


@pytest.fixture(scope="module")
def hf_tok(vocab_files):
    from transformers import RobertaTokenizer

    return RobertaTokenizer(vocab_files[0], vocab_files[1])


@pytest.fixture(scope="module")
def ours(vocab_files):
    return ByteLevelBPETokenizer(*vocab_files)


def _cases():
    cases = [t.format(l) for t in TEMPLATES[:10] for l in LABELS[:3]]
    cases += TRICKY
    return cases


def test_native_backend_built(ours):
    assert ours.backend == "native", "C++ engine must compile and load"


def test_raw_encode_matches_hf(ours, hf_tok):
    for text in _cases():
        expected = hf_tok.encode(text, add_special_tokens=False)
        got_py = ours._py.encode_text(text)
        assert got_py == expected, f"python engine mismatch on {text!r}"
        got = ours.encode_raw(text)
        assert got == expected, f"native engine mismatch on {text!r}"


def test_call_matches_hf_padding_truncation(ours, hf_tok):
    texts = _cases()[:25]
    for max_length in (8, 32):
        ref = hf_tok(
            texts, max_length=max_length, padding="max_length",
            truncation=True, return_attention_mask=True,
        )
        got = ours(texts, max_length=max_length)
        np.testing.assert_array_equal(got["input_ids"], np.array(ref["input_ids"]))
        np.testing.assert_array_equal(
            got["attention_mask"], np.array(ref["attention_mask"]))


def test_pair_encode_matches_hf(ours, hf_tok):
    """GLUE-style sentence pairs: ``<s> A </s></s> B </s>`` with real
    special-token ids must match HF ``tokenizer(a, b)`` token-for-token
    (reference DT/FT_text_task.py:113-240 encodes every pair task this way)."""
    cases = _cases()
    pairs = list(zip(cases, cases[1:] + cases[:1]))
    for a, b in pairs:
        expected = hf_tok.encode(a, b, add_special_tokens=True)
        got = ours.encode(a, text_pair=b)
        assert got == expected, f"pair mismatch on ({a!r}, {b!r})"


def test_pair_call_matches_hf_padding_truncation(ours, hf_tok):
    """Batched pair encoding with padding + longest-first truncation must
    match HF at several max_lengths, including ones that force truncation
    into one or both sequences."""
    cases = _cases()[:20]
    texts_a = cases
    texts_b = cases[::-1]
    for max_length in (10, 16, 32, 64):
        ref = hf_tok(
            texts_a, texts_b, max_length=max_length, padding="max_length",
            truncation=True, return_attention_mask=True,
        )
        got = ours(texts_a, text_pair=texts_b, max_length=max_length)
        np.testing.assert_array_equal(got["input_ids"], np.array(ref["input_ids"]))
        np.testing.assert_array_equal(
            got["attention_mask"], np.array(ref["attention_mask"]))


def test_pair_truncation_boundary(ours, hf_tok):
    """Truncation boundary sweep: for an asymmetric pair, every max_length
    from just-above-special-tokens to just-past-full-length must agree with
    HF's longest-first semantics exactly (ties removed from the second)."""
    a = "a photo and sound of playing violin with numbers 123"
    b = "church bells ringing in the rain near the sea waves and fireworks"
    full = len(ours.encode_raw(a)) + len(ours.encode_raw(b)) + 4
    for max_length in range(5, full + 2):
        expected = hf_tok.encode(
            a, b, add_special_tokens=True, truncation=True, max_length=max_length)
        got = ours.encode(a, text_pair=b, max_length=max_length)
        assert got == expected, f"max_length={max_length}"


def test_decode_roundtrip(ours):
    for text in ["hello world", "don't stop", "unicode café 東京"]:
        ids = ours.encode(text)
        assert ours.decode(ids) == text


def test_special_token_ids(ours):
    assert ours.bos_token_id == 0
    assert ours.pad_token_id == 1
    assert ours.eos_token_id == 2
    assert ours.unk_token_id == 3


def test_pretokenize_against_hf_regex():
    """Compare our scanner to the actual GPT-2 regex via the regex module if
    available, else via HF's slow tokenizer pattern behavior (covered above)."""
    try:
        import regex
    except ImportError:
        pytest.skip("regex module unavailable")
    pat = regex.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
    )
    for text in _cases() + ["!!!'s ok", "a  b", "a \n b", "  x"]:
        assert pretokenize(text) == pat.findall(text), repr(text)


def test_fuzz_random_unicode(ours, hf_tok):
    """Fuzz: random unicode mixtures must tokenize identically to HF in both
    engines (pre-tokenizer edge cases: spacing runs, contractions mid-noise,
    multi-byte codepoints, controls)."""
    import random

    rnd = random.Random(0)
    pools = [
        "abcdefgh XYZ 0123456789",
        "'s't' 'll've!@#$%^&*()[]{}.,;:!?-_",
        " \t\n\r\u00a0",
        "caf\u00e9\u00fc\u00df\u4e1c\u4eac\u97f3\u697d\U0001f3b5\u0416",
    ]
    for _ in range(60):
        n = rnd.randint(0, 40)
        text = "".join(rnd.choice(rnd.choice(pools)) for _ in range(n))
        expected = hf_tok.encode(text, add_special_tokens=False)
        assert ours._py.encode_text(text) == expected, repr(text)
        assert ours.encode_raw(text) == expected, repr(text)


def test_concurrent_native_encode_stable(ours):
    """8 threads hammer the native engine; every call must return the same
    ids as a single-threaded run (the shared ctypes output buffer is
    lock-guarded — serving dispatches concurrent requests into one engine)."""
    import threading

    assert ours.backend == "native"
    cases = _cases() * 4
    expected = {t: ours.encode_raw(t) for t in set(cases)}
    errors = []

    def worker(offset):
        for t in cases[offset:] + cases[:offset]:
            ids = ours.encode_raw(t)
            if ids != expected[t]:
                errors.append((t, ids))

    threads = [threading.Thread(target=worker, args=(i * 7,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, f"corrupted ids under concurrency: {errors[:3]}"
