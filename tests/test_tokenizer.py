"""Tokenizer contract tests (shape, padding, truncation, EOT-argmax invariant)."""

import numpy as np

from evr_tpu.tokenizer import ClipTokenizer


def test_shapes_and_specials():
    tok = ClipTokenizer()
    out = tok(["a photo of a cat", "violence in the street"])
    assert out.shape == (2, 77)
    assert out.dtype == np.int32
    assert (out[:, 0] == tok.sot_id).all()
    # EOT present exactly once per row
    assert ((out == tok.eot_id).sum(axis=1) == 1).all()


def test_eot_is_argmax():
    """The text tower pools at argmax(token id); EOT must be the largest id."""
    tok = ClipTokenizer()
    assert tok.eot_id == max(tok.encoder.values())
    out = tok("a man fighting on the street")
    eot_pos = int(np.argmax(out[0]))
    assert out[0, eot_pos] == tok.eot_id


def test_truncation_forces_eot():
    tok = ClipTokenizer()
    long_text = "word " * 500
    out = tok(long_text, truncate=True)
    assert out.shape == (1, 77)
    assert out[0, -1] == tok.eot_id
    try:
        tok(long_text, truncate=False)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_roundtrip_ascii():
    tok = ClipTokenizer()
    ids = tok.encode("hello world")
    assert tok.decode(ids).strip() == "hello world"


def test_deterministic_and_lowercased():
    tok = ClipTokenizer()
    a, b = tok.encode("Running DOG!"), tok.encode("running dog!")
    assert a == b
    assert tok.encode("  spaced    out  ") == tok.encode("spaced out")


def test_real_vocab_ids_when_available():
    """With the real OpenAI merge table supplied (EVR_TPU_BPE_VOCAB), the
    special ids must be the canonical 49406/49407."""
    import os

    import pytest

    if not os.environ.get("EVR_TPU_BPE_VOCAB"):
        pytest.skip("real BPE vocab not provided")
    tok = ClipTokenizer()
    assert tok.sot_id == 49406
    assert tok.eot_id == 49407
    assert tok.vocab_size == 49408
    # canonical encoding of a known phrase under the real vocab
    assert tok.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]


def test_unicode_bytes_covered():
    """Vietnamese queries (the reference's primary language) must tokenize."""
    tok = ClipTokenizer()
    ids = tok.encode("bạo lực trên đường phố")
    assert len(ids) > 0
    assert all(0 <= i < tok.vocab_size for i in ids)
