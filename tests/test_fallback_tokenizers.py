"""Zero-egress tokenizer fallbacks (tokenizer/fallbacks.py): deterministic
byte-level stand-ins that keep the SigLIP and Whisper pipelines drivable
without their gated vocabulary assets (VERDICT r3 item #8), explicitly
non-parity, with the real assets hot-swappable (``tokenizer_source``).
"""

import json
import wave

import numpy as np
import pytest

from evr_tpu.tokenizer.fallbacks import (
    SiglipFallbackTokenizer,
    WhisperFallbackTokenizer,
)


# -- SigLIP ------------------------------------------------------------------

def test_siglip_fallback_shapes_and_bounds():
    tok = SiglipFallbackTokenizer(context_length=64, vocab_size=32000)
    ids = tok(["a cat", "Hello  WORLD", ""])
    assert ids.shape == (3, 64) and ids.dtype == np.int32
    assert ids.min() >= 0 and ids.max() < 32000
    # canonicalization: case and whitespace folded
    np.testing.assert_array_equal(
        tok(["Hello  WORLD"])[0], tok(["hello world"])[0]
    )
    # distinct texts → distinct rows; determinism across instances
    assert not np.array_equal(ids[0], ids[1])
    np.testing.assert_array_equal(
        ids, SiglipFallbackTokenizer(64, 32000)(["a cat", "Hello  WORLD", ""])
    )


def test_siglip_fallback_truncation_and_roundtrip():
    tok = SiglipFallbackTokenizer(context_length=8, vocab_size=32000)
    ids = tok(["abcdefghijklmnop"])[0]
    assert ids.shape == (8,)
    assert ids[-1] == SiglipFallbackTokenizer.EOS_ID  # eos survives truncation
    # lossless byte round-trip inside the window (full-range vocab)
    assert tok.decode(tok.encode("abcdef")) == "abcdef"
    wide = SiglipFallbackTokenizer(context_length=64, vocab_size=32000)
    assert wide.decode(wide.encode("xin chào")) == "xin chào"


def test_siglip_fallback_tiny_vocab_folds():
    tok = SiglipFallbackTokenizer(context_length=8, vocab_size=50)
    ids = tok(["any text at all"])
    assert ids.max() < 50 and ids.min() >= 0


# -- Whisper -----------------------------------------------------------------

def test_whisper_fallback_roundtrip_and_special_skip():
    tok = WhisperFallbackTokenizer(eos_id=50257, sot_id=50258)
    ids = tok.encode("fighting in the street")
    assert all(0 <= i < 256 for i in ids)
    assert tok.decode(ids) == "fighting in the street"
    # specials and out-of-range ids are skipped, not crashed on
    assert tok.decode([50258] + ids + [50257]) == "fighting in the street"
    assert tok.decode([]) == ""


def test_whisper_asr_fallback_detokenizer_end_to_end():
    """Random-init tiny Whisper + fallback detokenizer: transcribe returns
    strings, transcribe_segments returns searchable text segments — the
    whole transcript pipeline runs with zero gated assets."""
    import jax

    from evr_tpu.models.whisper import (
        WhisperASR,
        WhisperConfig,
        init_whisper_params,
    )

    cfg = WhisperConfig(
        vocab_size=320, d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_heads=2, decoder_heads=2, ffn_dim=64,
        eos_id=316, sot_id=317,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    asr = WhisperASR(
        params, cfg, prompt_ids=[cfg.sot_id], max_len=8,
        detokenize="fallback",
    )
    assert asr.tokenizer_source == "fallback"
    audio = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32)
    (out,) = asr.transcribe(audio)
    assert isinstance(out, str)
    segs = asr.transcribe_segments(audio)
    assert all(isinstance(s["text"], str) and s["text"] for s in segs)


def test_transcribe_cli_fallback_segments_feed_speech_search(tmp_path):
    """The full zero-egress loop: transcribe CLI (fallback detokenizer) →
    transcript artifact → MetadataStore speech search finds the frame whose
    time window the matching segment covers."""
    from evr_tpu.query import MetadataStore
    from evr_tpu.query.metadata import SPEECH_CONF
    from evr_tpu.tools.transcribe import main as transcribe_main

    from tests.test_query import _frame

    wav = tmp_path / "clipvid.wav"
    sig = (np.sin(np.linspace(0, 330 * 2 * np.pi, 16000)) * 20000).astype(
        np.int16
    )
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.tobytes())

    out_dir = tmp_path / "metadata"
    out_dir.mkdir()
    transcribe_main(
        [str(wav), "--random-init", "--size", "tiny-test", "--max-len", "8",
         "--segments-out", str(out_dir)]
    )
    artifact = out_dir / "clipvid_transcript.json"
    assert artifact.exists()
    payload = json.loads(artifact.read_text())
    segs = payload["segments"]
    assert segs and all(isinstance(s["text"], str) for s in segs)

    store = MetadataStore()
    store.add_video("clipvid", [_frame(10)], fps=25.0)  # t=0.4s in segment 0
    store.add_transcript("clipvid", segs)
    needle = segs[0]["text"].split()[0] if segs[0]["text"].split() else None
    if needle is None:
        pytest.skip("random-init decode produced whitespace-only text")
    conf, text = store.speech_best_match(
        "clipvid", store.frame_by_idx("clipvid", 10), needle
    )
    assert conf == SPEECH_CONF and needle.lower() in text.lower()
