"""Validate and vendor the OpenAI CLIP BPE merge table as a repo asset.

The reference gets real CLIP token ids for free via pip ``clip``
(`Backend/services/embedding_service.py:151-184` → ``clip.tokenize``); this
rebuild implements the tokenizer from scratch but needs the merge-table
*data* (``bpe_simple_vocab_16e6.txt.gz``, ~1.4 MB, or a HuggingFace
``merges.txt``/``vocab.json`` pair) to produce OpenAI-compatible ids. That
file does not exist anywhere in the zero-egress build environment, so it
cannot be committed from here — this tool is the install path for when it
is available:

    python tools/vendor_bpe.py /path/to/bpe_simple_vocab_16e6.txt.gz

It validates the table by constructing a tokenizer from it and checking the
canonical CLIP invariants (vocab size 49408, SOT/EOT ids 49406/49407, and a
known golden encoding), then copies it into ``evr_tpu/tokenizer/assets/``
where ``ClipTokenizer()`` auto-loads it with zero configuration. After
vendoring, ``tests/test_tokenizer.py::test_real_vocab_ids_when_available``
and ``tests/test_tokenizer_hf_parity.py`` run against the real 49k merges.
"""

from __future__ import annotations

import argparse
import pathlib
import shutil
import sys

# canonical encodings under the real OpenAI vocabulary
GOLDEN = {
    "a photo of a cat": [320, 1125, 539, 320, 2368],
    "a photo of a dog": [320, 1125, 539, 320, 1929],
}


def validate(path: pathlib.Path) -> list[str]:
    """Return a list of validation failures (empty = valid)."""
    from evr_tpu.tokenizer.bpe import ClipTokenizer

    errors: list[str] = []
    try:
        tok = ClipTokenizer(vocab_path=path)
    except Exception as e:  # unreadable / malformed table
        return [f"failed to load: {e!r}"]
    if tok.vocab_size != 49408:
        errors.append(f"vocab_size {tok.vocab_size} != 49408")
    if tok.sot_id != 49406:
        errors.append(f"sot_id {tok.sot_id} != 49406")
    if tok.eot_id != 49407:
        errors.append(f"eot_id {tok.eot_id} != 49407")
    for text, want in GOLDEN.items():
        got = tok.encode(text)
        if got != want:
            errors.append(f"encode({text!r}) = {got} != {want}")
    return errors


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("vocab", type=pathlib.Path,
                    help="bpe_simple_vocab_16e6.txt.gz or HF merges.txt")
    ap.add_argument("--check-only", action="store_true",
                    help="validate without installing")
    args = ap.parse_args(argv)

    if not args.vocab.exists():
        print(f"error: {args.vocab} does not exist", file=sys.stderr)
        return 2
    errors = validate(args.vocab)
    if errors:
        print("vocab FAILED validation:", file=sys.stderr)
        for e in errors:
            print(f"  - {e}", file=sys.stderr)
        return 1
    print(f"{args.vocab}: valid OpenAI CLIP merge table")
    if args.check_only:
        return 0

    from evr_tpu.tokenizer.bpe import _ASSETS_DIR

    _ASSETS_DIR.mkdir(parents=True, exist_ok=True)
    if args.vocab.name == "merges.txt":
        dest = _ASSETS_DIR / "merges.txt"
        shutil.copy2(args.vocab, dest)
        vocab_json = args.vocab.with_name("vocab.json")
        if vocab_json.exists():
            shutil.copy2(vocab_json, _ASSETS_DIR / "vocab.json")
    else:
        dest = _ASSETS_DIR / "bpe_simple_vocab_16e6.txt.gz"
        shutil.copy2(args.vocab, dest)
    print(f"installed → {dest}; ClipTokenizer() now loads it by default")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
