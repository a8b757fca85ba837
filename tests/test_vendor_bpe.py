"""tools/vendor_bpe.py: validation + assets-dir auto-resolution.

The real OpenAI merge table is absent in this zero-egress environment, so
these tests exercise the *rejection* path (a synthetic table must fail the
canonical-id validation) and the assets-dir loading machinery that makes a
vendored table the zero-config default."""

import json

import pytest

from evr_tpu.tokenizer import ClipTokenizer
from evr_tpu.tokenizer.bpe import EOT_TOKEN, SOT_TOKEN, bytes_to_unicode
from tools import vendor_bpe


@pytest.fixture()
def synthetic_assets(tmp_path):
    chars = list(bytes_to_unicode().values())
    merges = [("t", "h"), ("th", "e</w>"), ("c", "a"), ("ca", "t</w>")]
    vocab_list = (
        chars + [c + "</w>" for c in chars] + ["".join(m) for m in merges]
        + [SOT_TOKEN, EOT_TOKEN]
    )
    vocab = {tok: i for i, tok in enumerate(vocab_list)}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab, ensure_ascii=False))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"
    )
    return tmp_path


def test_validate_rejects_synthetic_table(synthetic_assets):
    errors = vendor_bpe.validate(synthetic_assets / "merges.txt")
    # wrong vocab size AND wrong golden encodings
    assert any("vocab_size" in e for e in errors)
    assert any("encode(" in e for e in errors)


def test_validate_rejects_garbage(tmp_path):
    bad = tmp_path / "bpe_simple_vocab_16e6.txt.gz"
    bad.write_bytes(b"\x00\x01 not gzip")
    assert vendor_bpe.validate(bad)


def test_cli_check_only_fails_on_synthetic(synthetic_assets, capsys):
    rc = vendor_bpe.main([str(synthetic_assets / "merges.txt"), "--check-only"])
    assert rc == 1
    assert "FAILED validation" in capsys.readouterr().err


def test_cli_missing_file():
    assert vendor_bpe.main(["/nonexistent/vocab.gz", "--check-only"]) == 2


def test_assets_dir_is_probed_first(synthetic_assets, monkeypatch):
    """A table in the assets search path loads with zero configuration."""
    import evr_tpu.tokenizer.bpe as bpe

    monkeypatch.delenv("EVR_TPU_BPE_VOCAB", raising=False)
    monkeypatch.setattr(
        bpe, "_VOCAB_SEARCH_PATHS", (str(synthetic_assets / "merges.txt"),)
    )
    tok = ClipTokenizer()
    assert tok.vocab_source.endswith("merges.txt")
    # merges actually apply: "cat" collapses to the merged token
    assert len(tok.encode("cat")) == 1


def test_search_paths_include_repo_assets_dir():
    import evr_tpu.tokenizer.bpe as bpe

    assert any("tokenizer" in p and "assets" in p for p in bpe._VOCAB_SEARCH_PATHS)
