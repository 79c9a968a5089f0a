"""Tokenizer golden-vector and behavior tests.

Golden vectors come from the reference's (stale but correct) unit test
(/root/reference/src/token/clip.rs:232-249) plus known CLIP BPE behavior.
"""

import pytest

from sdxl_tpu.tokenizer import ClipTokenizer, OpenClipTokenizer, tokenize_text


@pytest.fixture(scope="module")
def clip_tok(tokenizer_dir):
    return ClipTokenizer(tokenizer_dir)


@pytest.fixture(scope="module")
def open_clip_tok(tokenizer_dir):
    return OpenClipTokenizer(tokenizer_dir)


def test_clip_vocab_size(clip_tok):
    assert len(clip_tok.encoder) == 49408
    assert clip_tok.encoder["<|startoftext|>"] == 49406
    assert clip_tok.encoder["<|endoftext|>"] == 49407


def test_clip_golden_encode(clip_tok):
    # clip.rs:240-242 (encode without sot/eot in the legacy signature)
    text = "Hello world! <|startoftext|>asdf<|startoftext|>"
    target = [3306, 1002, 256, 49406, 587, 10468, 49406]
    assert clip_tok.encode(text, add_sot=False, add_eot=False) == target


def test_clip_golden_decode(clip_tok):
    target = [3306, 1002, 256, 49406, 587, 10468, 49406]
    assert (
        clip_tok.decode(target)
        == "hello world ! <|startoftext|>asdf <|startoftext|>"
    )


def test_clip_sot_eot_wrap(clip_tok):
    ids = clip_tok.encode("a photo of a cat", add_sot=True, add_eot=True)
    assert ids[0] == 49406 and ids[-1] == 49407
    # "a photo of a cat" is a known CLIP sequence
    assert ids == [49406, 320, 1125, 539, 320, 2368, 49407]


def test_open_clip_same_ids_different_pad(clip_tok, open_clip_tok):
    # Both towers share the byte-BPE construction for ordinary text.
    text = "a photo of a cat"
    assert open_clip_tok.encode(text) == clip_tok.encode(text)
    assert open_clip_tok.pad_token == 0
    assert clip_tok.pad_token == 49407


def test_open_clip_vocab_loaded(open_clip_tok):
    assert len(open_clip_tok.encoder) == 49408


def test_tokenize_text_pads_to_77(clip_tok, open_clip_tok):
    ids = tokenize_text("a cat", clip_tok, 77)
    assert len(ids) == 77
    assert ids[-1] == 49407  # CLIP pads with EOT
    ids2 = tokenize_text("a cat", open_clip_tok, 77)
    assert len(ids2) == 77
    assert ids2[-1] == 0  # OpenCLIP pads with 0


def test_tokenize_text_truncates(clip_tok):
    ids = tokenize_text("cat " * 200, clip_tok, 77)
    assert len(ids) == 77


def test_empty_prompt(clip_tok):
    # the unconditional context is built from "" (stablediffusion/mod.rs:704)
    assert clip_tok.encode("", add_sot=True, add_eot=True) == [49406, 49407]


def test_whitespace_and_case_cleaning(clip_tok):
    a = clip_tok.encode("  A   CAT  ")
    b = clip_tok.encode("a cat")
    assert a == b


def test_vendored_matches_reference_data(clip_tok, reference_tokenizer_dir):
    """The vendored in-package table must be equivalent to loading the
    reference's on-disk tokenizer data (clip merges slice + open_clip
    vocab/merges) — identical vocab, identical merge ranks."""
    ref_clip = ClipTokenizer(reference_tokenizer_dir)
    ref_oc = OpenClipTokenizer(reference_tokenizer_dir)
    assert dict(clip_tok.encoder) == dict(ref_clip.encoder)
    assert dict(clip_tok.bpe_ranks) == dict(ref_clip.bpe_ranks)
    vend_oc = OpenClipTokenizer(None)
    assert dict(vend_oc.encoder) == dict(ref_oc.encoder)
    assert dict(vend_oc.bpe_ranks) == dict(ref_oc.bpe_ranks)


def test_self_contained_no_reference_mount(monkeypatch, tmp_path):
    """ClipTokenizer() must work with no external data dir at all."""
    monkeypatch.delenv("SDXL_TPU_TOKENIZER_DIR", raising=False)
    monkeypatch.chdir(tmp_path)  # no ./tokenizer here
    tok = ClipTokenizer()
    assert tok.encode("a photo of a cat") == [49406, 320, 1125, 539, 320, 2368, 49407]
    oc = OpenClipTokenizer()
    assert len(oc.encoder) == 49408 and oc.pad_token == 0


def test_roundtrip(clip_tok):
    # decode re-inserts word boundaries at "</w>" so digits/punctuation gain
    # spaces — the reference calls this out ("extra spaces sometimes",
    # clip.rs:242). Compare modulo whitespace.
    text = "the quick brown fox jumps over 12 lazy dogs!"
    ids = clip_tok.encode(text, add_sot=False, add_eot=False)
    assert clip_tok.decode(ids).replace(" ", "") == text.replace(" ", "")
