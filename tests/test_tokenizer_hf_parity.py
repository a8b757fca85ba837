"""BPE algorithm parity: our ClipTokenizer must produce identical ids to
HuggingFace's CLIPTokenizer when both load the same vocab/merges assets.

This validates the merge loop, byte-level encoding, and special-token
handling against the established implementation without needing the real
49k-merge OpenAI table (which validates automatically when present via
EVR_TPU_BPE_VOCAB — same code path)."""

import json

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from evr_tpu.tokenizer import ClipTokenizer
from evr_tpu.tokenizer.bpe import SOT_TOKEN, EOT_TOKEN, bytes_to_unicode


@pytest.fixture(scope="module")
def asset_pair(tmp_path_factory):
    """Build a consistent (vocab.json, merges.txt) pair: byte vocab +
    </w> variants + a handful of merges over common english fragments."""
    d = tmp_path_factory.mktemp("bpe")
    chars = list(bytes_to_unicode().values())
    vocab_list = chars + [c + "</w>" for c in chars]
    merges = [
        ("t", "h"),
        ("th", "e</w>"),
        ("i", "n"),
        ("a", "n"),
        ("an", "d</w>"),
        ("in", "g</w>"),
        ("f", "i"),
        ("fi", "g"),
        ("fig", "h"),
        ("figh", "t</w>"),
        ("r", "e"),
        ("e", "d</w>"),
    ]
    vocab_list += ["".join(m) for m in merges]
    vocab_list += [SOT_TOKEN, EOT_TOKEN]
    vocab = {tok: i for i, tok in enumerate(vocab_list)}

    (d / "vocab.json").write_text(json.dumps(vocab, ensure_ascii=False))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"
    )
    return d


@pytest.fixture(scope="module")
def tokenizers(asset_pair):
    ours = ClipTokenizer(vocab_path=asset_pair / "merges.txt")
    theirs = transformers.CLIPTokenizer(
        vocab_file=str(asset_pair / "vocab.json"),
        merges_file=str(asset_pair / "merges.txt"),
    )
    return ours, theirs


@pytest.mark.parametrize(
    "text",
    [
        "the fight",
        "a man fighting in the red street",
        "and the thing",
        "THE RED FIGHT!!!",
        "it's fine, isn't it?",
        "123 go",
        "multi   space\ttext",
    ],
)
def test_encode_matches_hf(tokenizers, text):
    ours, theirs = tokenizers
    assert ours.encode(text) == theirs.encode(text, add_special_tokens=False)


def test_specials_and_batch_format(tokenizers):
    ours, theirs = tokenizers
    assert ours.sot_id == theirs.convert_tokens_to_ids(SOT_TOKEN)
    assert ours.eot_id == theirs.convert_tokens_to_ids(EOT_TOKEN)
    batch = ours("the fight")
    hf_ids = theirs("the fight", add_special_tokens=True)["input_ids"]
    np.testing.assert_array_equal(batch[0, : len(hf_ids)], hf_ids)
    assert (batch[0, len(hf_ids) :] == 0).all()


def test_vocab_source_recorded(asset_pair, monkeypatch):
    tok = ClipTokenizer(vocab_path=asset_pair / "merges.txt")
    assert tok.vocab_source.endswith("merges.txt")
    # force the no-assets environment so this stays correct after a real
    # table is vendored into evr_tpu/tokenizer/assets/
    import evr_tpu.tokenizer.bpe as bpe

    monkeypatch.delenv("EVR_TPU_BPE_VOCAB", raising=False)
    monkeypatch.setattr(bpe, "_VOCAB_SEARCH_PATHS", ())
    fallback = ClipTokenizer()
    assert fallback.vocab_source == "fallback"
