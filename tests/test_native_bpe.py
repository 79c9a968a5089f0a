"""Native (C++) vs Python BPE parity."""

import pytest

from sdxl_tpu.tokenizer import ClipTokenizer
from sdxl_tpu.tokenizer.native import try_native_bpe


@pytest.fixture(scope="module")
def tok(tokenizer_dir):
    return ClipTokenizer(tokenizer_dir)


def _python_bpe(tok, token):
    native, tok._native = tok._native, None
    cache = dict(tok._cache)
    tok._cache = {k: v for k, v in cache.items() if k.startswith("<|")}
    try:
        return tok.bpe(token)
    finally:
        tok._native = native
        tok._cache = cache


CORPUS = [
    "hello", "world", "a", "photography", "extraordinarily",
    "cat", "dogs", "12345", "...", "sdxl", "tokenization",
    "antidisestablishmentarianism", "x", "zzzzzz", "Ã©",
]


def test_native_built(tok):
    if tok._native is None:
        pytest.skip("native toolchain unavailable")


def test_native_matches_python_corpus(tok):
    if tok._native is None:
        pytest.skip("native toolchain unavailable")
    b2u = __import__("sdxl_tpu.tokenizer.bpe", fromlist=["bytes_to_unicode"]).bytes_to_unicode()
    for word in CORPUS:
        mapped = "".join(b2u[b] for b in word.encode("utf-8"))
        native = tok._native.apply(mapped)
        python = _python_bpe(tok, mapped)
        assert native == python, f"mismatch on {word!r}: {native!r} != {python!r}"


def test_full_encode_identical_with_and_without_native(tok, tokenizer_dir):
    if tok._native is None:
        pytest.skip("native toolchain unavailable")
    text = "A Photograph of an Astronaut Riding a Horse, 4k, dramatic lighting!"
    with_native = tok.encode(text)
    t2 = ClipTokenizer(tokenizer_dir)
    t2._native = None
    t2._cache = {k: v for k, v in t2._cache.items() if k.startswith("<|")}
    without = t2.encode(text)
    assert with_native == without
