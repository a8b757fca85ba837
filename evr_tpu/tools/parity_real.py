"""`make parity-real` — the real-asset parity gates as ONE checkable
contract (VERDICT r3 #6).

Algorithm-level parity is proven in-tree against torch/HF at production
geometry (tests/), but the BASELINE "identical behavior vs the reference's
real checkpoints" gates need assets this zero-egress image cannot fetch:
the OpenAI BPE merge table, CLIP ViT-B/32 weights, Whisper weights +
tokenizer, the SigLIP SentencePiece model. This tool probes for each
asset, runs the gate when present, and otherwise emits a machine-readable
SKIPPED entry naming the asset and how to provide it — so "parity is one
vendoring away" is a contract a CI job can check, not prose.

Output: one JSON report (stdout + ``--out`` file), schema:

    {"generated": <iso>, "gates": [
        {"gate": str, "status": "OK" | "FAILED" | "SKIPPED",
         "reason": str,              # SKIPPED/FAILED: what and why
         "how_to_provide": str,      # SKIPPED: the exact knob
         "metrics": {...}},          # OK/FAILED: measured numbers
     ...], "summary": {"ok": N, "failed": N, "skipped": N}}

Exit code: 0 when no gate FAILED (SKIPPED is not failure), 1 otherwise.

Asset knobs (env vars, all optional):
    EVR_TPU_BPE_VOCAB          OpenAI bpe_simple_vocab_16e6.txt.gz
                               (or vendor once: `python tools/vendor_bpe.py`)
    EVR_TPU_CLIP_CHECKPOINT    ViT-B/32 weights (.pt or HF dir)
    EVR_TPU_WHISPER_CHECKPOINT HF whisper dir or converted .npz
    EVR_TPU_WHISPER_TOKENIZER  HF WhisperTokenizer assets dir
    EVR_TPU_WHISPER_AUDIO      a wav file with known speech (optional)
    EVR_TPU_WHISPER_EXPECT     its expected transcript (optional)
    EVR_TPU_SIGLIP_TOKENIZER   HF SiglipTokenizer/SentencePiece dir

Reference parity targets: `Backend/services/embedding_service.py:93-120`
(model load + encode), the golden `Backend/embedding/*.npy` fixtures.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import pathlib


def _gate_bpe() -> dict:
    vendored = (
        pathlib.Path(__file__).resolve().parents[1]
        / "tokenizer" / "assets" / "bpe_simple_vocab_16e6.txt.gz"
    )
    env = os.environ.get("EVR_TPU_BPE_VOCAB")
    if not env and not vendored.exists():
        return {
            "gate": "clip_bpe_tokenizer_ids",
            "status": "SKIPPED",
            "reason": "OpenAI merge table absent (zero-egress image)",
            "how_to_provide": (
                "EVR_TPU_BPE_VOCAB=/path/to/bpe_simple_vocab_16e6.txt.gz "
                "or `python tools/vendor_bpe.py /path/to/table.gz`"
            ),
        }
    from evr_tpu.tokenizer import ClipTokenizer

    tok = ClipTokenizer()
    # canonical ids under the real vocab (pip-clip ground truth)
    checks = {
        "sot": (tok.sot_id, 49406),
        "eot": (tok.eot_id, 49407),
        "vocab": (tok.vocab_size, 49408),
        "phrase": (tok.encode("a photo of a cat"), [320, 1125, 539, 320, 2368]),
    }
    bad = {k: {"got": g, "want": w} for k, (g, w) in checks.items() if g != w}
    return {
        "gate": "clip_bpe_tokenizer_ids",
        "status": "FAILED" if bad else "OK",
        "reason": f"canonical-id mismatches: {bad}" if bad else
                  "sot/eot/vocab/known-phrase ids match pip-clip",
        "metrics": {"mismatches": len(bad)},
    }


def _gate_clip_golden(reference_root: str) -> dict:
    ckpt = os.environ.get("EVR_TPU_CLIP_CHECKPOINT")
    ref = pathlib.Path(reference_root)
    if not ckpt:
        return {
            "gate": "clip_golden_retrieval",
            "status": "SKIPPED",
            "reason": "no real ViT-B/32 weights (zero-egress image)",
            "how_to_provide": (
                "EVR_TPU_CLIP_CHECKPOINT=ViT-B-32.pt (pip-clip layout), a "
                "reference fine-tune .pt, or an HF CLIPModel directory"
            ),
        }
    if not ref.exists():
        return {
            "gate": "clip_golden_retrieval",
            "status": "SKIPPED",
            "reason": "reference golden fixtures not mounted",
            "how_to_provide": f"mount the reference Backend at {ref}",
        }
    import jax
    import numpy as np

    from evr_tpu.index import EmbeddingEngine, FrameIndex
    from evr_tpu.tools.parity_check import load_any_checkpoint

    jax.config.update("jax_default_matmul_precision", "highest")
    clip_params, cfg = load_any_checkpoint(ckpt)
    engine = EmbeddingEngine(
        cfg=cfg, params=clip_params, preprocess_mode="pil",
        compute_dtype=None,
    )
    metrics: dict = {}
    worst_cos, worst_r1, worst_r5 = 1.0, 1.0, 1.0
    ran = 0
    for video in ("Violence_2", "Violence"):
        frames_dir = ref / "static" / "processed_frames" / video
        golden_path = ref / "embedding" / f"{video}_embeddings.npy"
        meta_path = ref / "metadata" / f"{video}_metadata.json"
        if not (frames_dir.exists() and golden_path.exists()
                and meta_path.exists()):
            continue
        golden = np.load(golden_path).astype(np.float32)
        golden /= np.maximum(
            np.linalg.norm(golden, axis=1, keepdims=True), 1e-12
        )
        order = [m["frameid"]
                 for m in json.loads(meta_path.read_text("utf-8"))]
        ours = engine.encode_image_files(
            [frames_dir / n for n in order], normalise=True
        )
        cos = float((ours * golden).sum(axis=1).min())
        idx_o, idx_g = FrameIndex(cfg.embed_dim), FrameIndex(cfg.embed_dim)
        idx_o.add_video(video, ours, order)
        idx_g.add_video(video, golden, order)
        probes = golden[:: max(1, len(order) // 20)]
        _, ro = idx_o.search_raw(probes, 5)
        _, rg = idx_g.search_raw(probes, 5)
        r1 = float((ro[:, 0] == rg[:, 0]).mean())
        r5 = float(
            np.mean([len(set(a) & set(b)) / 5 for a, b in zip(ro, rg)])
        )
        metrics[video] = {"min_cosine": cos, "r1_agree": r1, "r5_agree": r5}
        worst_cos, worst_r1, worst_r5 = (
            min(worst_cos, cos), min(worst_r1, r1), min(worst_r5, r5)
        )
        ran += 1
    if not ran:
        return {
            "gate": "clip_golden_retrieval", "status": "SKIPPED",
            "reason": "no complete golden fixture video found",
            "how_to_provide": "mount Backend/{static,embedding,metadata}",
        }
    ok = worst_r1 == 1.0 and worst_r5 >= 0.98 and worst_cos > 0.99
    return {
        "gate": "clip_golden_retrieval",
        "status": "OK" if ok else "FAILED",
        "reason": (
            "R@1/R@5 rank identity + cosine>0.99 vs golden embeddings"
            if ok else
            f"divergence: min_cos={worst_cos:.4f} r1={worst_r1:.3f} "
            f"r5={worst_r5:.3f}"
        ),
        "metrics": metrics,
    }


def _gate_whisper() -> dict:
    ckpt = os.environ.get("EVR_TPU_WHISPER_CHECKPOINT")
    tok_dir = os.environ.get("EVR_TPU_WHISPER_TOKENIZER")
    if not ckpt or not tok_dir:
        missing = [n for n, v in
                   [("EVR_TPU_WHISPER_CHECKPOINT", ckpt),
                    ("EVR_TPU_WHISPER_TOKENIZER", tok_dir)] if not v]
        return {
            "gate": "whisper_real_transcription",
            "status": "SKIPPED",
            "reason": f"missing {', '.join(missing)} (zero-egress image)",
            "how_to_provide": (
                "EVR_TPU_WHISPER_CHECKPOINT=<HF whisper-* dir or converted "
                ".npz> EVR_TPU_WHISPER_TOKENIZER=<HF tokenizer dir>; "
                "optionally EVR_TPU_WHISPER_AUDIO=<wav> "
                "EVR_TPU_WHISPER_EXPECT='<transcript>' for a WER gate"
            ),
        }
    import numpy as np

    from evr_tpu.models.whisper import (
        WHISPER_SIZES, WhisperASR, from_hf_whisper_state_dict,
    )
    from evr_tpu.tools.transcribe import _load_detokenizer

    detok = _load_detokenizer(tok_dir)
    p = pathlib.Path(ckpt)
    size = os.environ.get("EVR_TPU_WHISPER_SIZE", "tiny")
    cfg = WHISPER_SIZES[size]
    if p.is_dir():
        from transformers import WhisperForConditionalGeneration

        model = WhisperForConditionalGeneration.from_pretrained(str(p))
        params = from_hf_whisper_state_dict(
            {k: v.numpy() for k, v in model.state_dict().items()}, cfg
        )
    else:
        import torch

        sd = torch.load(str(p), map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params = from_hf_whisper_state_dict(
            {k: v.numpy() for k, v in sd.items()}, cfg
        )
    # EVR_TPU_WHISPER_MAXLEN: decode budget (rehearsal shrinks it so the
    # random-weight mechanics pass doesn't pay a 224-token CPU decode)
    max_len = int(os.environ.get("EVR_TPU_WHISPER_MAXLEN", "224"))
    asr = WhisperASR(params, cfg, prompt_ids=[cfg.sot_id], detokenize=detok,
                     max_len=max_len)

    audio_path = os.environ.get("EVR_TPU_WHISPER_AUDIO")
    expect = os.environ.get("EVR_TPU_WHISPER_EXPECT")
    if audio_path and expect:
        import wave

        with wave.open(audio_path, "rb") as w:
            pcm = np.frombuffer(
                w.readframes(w.getnframes()), np.int16
            ).astype(np.float32) / 32768.0
        text = asr.transcribe(pcm)[0]
        got = str(text).lower().split()
        want = expect.lower().split()
        inter = len(set(got) & set(want))
        wer_proxy = 1.0 - inter / max(1, len(want))
        ok = wer_proxy <= 0.3
        return {
            "gate": "whisper_real_transcription",
            "status": "OK" if ok else "FAILED",
            "reason": f"word-overlap error {wer_proxy:.2f} vs expected "
                      f"transcript (gate ≤ 0.30)",
            "metrics": {"word_overlap_error": wer_proxy, "text": text},
        }
    # no known-speech fixture: the gate is load+run end-to-end
    tone = np.sin(
        2 * np.pi * 440 * np.arange(16000 * 2) / 16000
    ).astype(np.float32)
    text = str(asr.transcribe(tone)[0])
    return {
        "gate": "whisper_real_transcription",
        "status": "OK",
        "reason": "real weights + tokenizer load and transcribe "
                  "end-to-end (no known-speech fixture: quality gate "
                  "needs EVR_TPU_WHISPER_AUDIO/EXPECT)",
        "metrics": {"sample_output_chars": len(text)},
    }


def _gate_siglip_tokenizer() -> dict:
    tok_dir = os.environ.get("EVR_TPU_SIGLIP_TOKENIZER")
    if not tok_dir:
        return {
            "gate": "siglip_tokenizer_ids",
            "status": "SKIPPED",
            "reason": "SigLIP SentencePiece assets absent "
                      "(zero-egress image)",
            "how_to_provide": (
                "EVR_TPU_SIGLIP_TOKENIZER=<HF siglip tokenizer dir>; the "
                "serving engine then runs with tokenizer_source='provided' "
                "instead of the deterministic byte fallback"
            ),
        }
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tok_dir)
    ids = tok(
        ["a photo of a cat"], padding="max_length", truncation=True,
        max_length=64, return_tensors="np",
    )["input_ids"]
    ok = ids.shape == (1, 64) and int(ids[0, -1]) in (tok.pad_token_id, 1)
    return {
        "gate": "siglip_tokenizer_ids",
        "status": "OK" if ok else "FAILED",
        "reason": "real SentencePiece tokenizer loads and pads to the "
                  "SigLIP context" if ok else f"unexpected ids {ids[:8]}",
        "metrics": {"context": int(ids.shape[1])},
    }


def build_rehearsal_assets(
    root: pathlib.Path,
    gates: tuple[str, ...] = ("bpe", "clip", "whisper", "siglip"),
) -> dict[str, str]:
    """Synthetic stand-ins for every real asset the gates probe for
    (VERDICT r4 #6): a structurally-valid BPE merge table, a random-weight
    HF-layout ViT-B/32 CLIPModel dir + a matching synthetic golden-fixture
    tree, a random-weight HF whisper-tiny dir + a toy WhisperTokenizer, and
    a toy SigLIP-style fast tokenizer. Returns the env-knob dict that routes
    the gates at them. Values are synthetic, so this proves the harness
    MECHANICS (load → convert → encode → compare → report), not parity."""
    root.mkdir(parents=True, exist_ok=True)
    env: dict[str, str] = {}

    if "bpe" in gates:
        _rehearsal_bpe(root, env)
    if "clip" in gates:
        _rehearsal_clip(root, env)
    if "whisper" in gates:
        _rehearsal_whisper(root, env)
    if "siglip" in gates:
        _rehearsal_siglip(root, env)
    return env


def _rehearsal_bpe(root: pathlib.Path, env: dict) -> None:
    # BPE merge table: right line COUNT (so sot/eot/vocab_size land on
    # 49406/49407/49408 — structure checks pass), toy merge CONTENT (the
    # known-phrase ids check is expected to mismatch: only the real table
    # can satisfy it, and the rehearsal classifier accepts exactly that).
    import gzip

    from evr_tpu.tokenizer.bpe import bytes_to_unicode

    chars = list(bytes_to_unicode().values())
    need = 49152 - 256 - 2  # the slice _load_openai_merges takes
    lines = ["#version: rehearsal 0.0"]
    for i in range(need):
        lines.append(f"{chars[(i // len(chars)) % len(chars)]} "
                     f"{chars[i % len(chars)]}</w>")
    bpe_path = root / "bpe_simple_vocab_16e6.txt.gz"
    with gzip.open(bpe_path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines))
    env["EVR_TPU_BPE_VOCAB"] = str(bpe_path)


def _rehearsal_clip(root: pathlib.Path, env: dict) -> None:
    # random-weight HF-layout CLIP (default HF CLIPConfig IS ViT-B/32
    # geometry, which load_any_checkpoint assumes for HF dirs) + a synthetic
    # reference tree whose "golden" embeddings are computed by the SAME
    # loader+engine path the gate itself uses.
    import cv2
    import numpy as np

    from transformers import CLIPConfig as HFCLIPConfig, CLIPModel

    clip_dir = root / "clip_hf"
    if not (clip_dir / "config.json").exists():
        import torch

        torch.manual_seed(0)
        CLIPModel(HFCLIPConfig()).save_pretrained(str(clip_dir))
    env["EVR_TPU_CLIP_CHECKPOINT"] = str(clip_dir)

    ref_root = root / "reference_backend"
    video = "Violence_2"
    frames_dir = ref_root / "static" / "processed_frames" / video
    frames_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    order = []
    for i in range(12):
        name = f"{i}.jpg"
        img = rng.integers(0, 256, size=(96, 128, 3)).astype(np.uint8)
        cv2.imwrite(str(frames_dir / name), img)
        order.append(name)
    (ref_root / "metadata").mkdir(exist_ok=True)
    (ref_root / "metadata" / f"{video}_metadata.json").write_text(
        json.dumps([{"frameid": n, "frameidx": i} for i, n in enumerate(order)])
    )
    import jax

    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.tools.parity_check import load_any_checkpoint

    jax.config.update("jax_default_matmul_precision", "highest")
    clip_params, cfg = load_any_checkpoint(str(clip_dir))
    engine = EmbeddingEngine(
        cfg=cfg, params=clip_params, preprocess_mode="pil", compute_dtype=None
    )
    golden = engine.encode_image_files(
        [frames_dir / n for n in order], normalise=False
    )
    (ref_root / "embedding").mkdir(exist_ok=True)
    np.save(ref_root / "embedding" / f"{video}_embeddings.npy", golden)
    env["EVR_TPU_REFERENCE_ROOT"] = str(ref_root)


def _rehearsal_whisper(root: pathlib.Path, env: dict) -> None:
    # random-weight HF whisper-tiny + toy WhisperTokenizer dir
    wdir = root / "whisper_hf"
    if not (wdir / "config.json").exists():
        from transformers import (
            WhisperConfig as HFWhisperConfig,
            WhisperForConditionalGeneration,
        )

        wcfg = HFWhisperConfig(
            d_model=384, encoder_layers=4, decoder_layers=4,
            encoder_attention_heads=6, decoder_attention_heads=6,
            encoder_ffn_dim=1536, decoder_ffn_dim=1536,
        )
        WhisperForConditionalGeneration(wcfg).save_pretrained(str(wdir))
    env["EVR_TPU_WHISPER_CHECKPOINT"] = str(wdir)

    wtok = root / "whisper_tok"
    wtok.mkdir(exist_ok=True)
    vocab = {"<|endoftext|>": 0}
    vocab.update({f"tok{i}": i for i in range(1, 512)})
    (wtok / "vocab.json").write_text(json.dumps(vocab))
    (wtok / "merges.txt").write_text("#version: rehearsal\n")
    (wtok / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "WhisperTokenizer",
        "unk_token": "<|endoftext|>", "bos_token": "<|endoftext|>",
        "eos_token": "<|endoftext|>", "pad_token": "<|endoftext|>",
        "model_max_length": 448,
    }))
    env["EVR_TPU_WHISPER_TOKENIZER"] = str(wtok)
    env["EVR_TPU_WHISPER_MAXLEN"] = "8"  # mechanics, not quality


def _rehearsal_siglip(root: pathlib.Path, env: dict) -> None:
    # toy SigLIP-style fast tokenizer (pads to the 64 context)
    sdir = root / "siglip_tok"
    sdir.mkdir(exist_ok=True)
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    t = Tokenizer(WordLevel(
        {"<pad>": 0, "<unk>": 1, "a": 2, "photo": 3, "of": 4, "cat": 5},
        unk_token="<unk>",
    ))
    t.pre_tokenizer = Whitespace()
    t.save(str(sdir / "tokenizer.json"))
    (sdir / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "pad_token": "<pad>", "unk_token": "<unk>", "model_max_length": 64,
    }))
    env["EVR_TPU_SIGLIP_TOKENIZER"] = str(sdir)


def _rehearsal_mechanics(gate: dict) -> bool:
    """Did the gate's machinery EXECUTE (load, convert, encode, compare,
    report)? OK always qualifies; the BPE gate is value-locked to the real
    vocab, so with the synthetic table the expected outcome is FAILED with
    exactly the known-phrase mismatch (structure checks matched). SKIPPED
    means an env knob failed to route — a rehearsal failure."""
    if gate["status"] == "OK":
        return True
    if gate["gate"] == "clip_bpe_tokenizer_ids" and gate["status"] == "FAILED":
        return gate.get("metrics", {}).get("mismatches") == 1
    return False


def main(argv=None) -> int:
    from evr_tpu.utils.platform_pin import pin_platform_from_env

    pin_platform_from_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference-root", default="/root/reference/Backend")
    ap.add_argument("--out", default="parity_real_report.json")
    ap.add_argument(
        "--rehearse", action="store_true",
        help="build synthetic stand-ins for every real asset and run all "
        "four gates end-to-end, asserting harness MECHANICS (load, convert, "
        "encode, compare, report) rather than golden values — so the day "
        "real weights appear the harness is known-executable (VERDICT r4 #6)",
    )
    ap.add_argument(
        "--rehearse-dir", default=None,
        help="where rehearsal assets are built (default: a temp dir; pass a "
        "path to reuse the ~700 MB of generated weights across runs)",
    )
    args = ap.parse_args(argv)

    rehearse = args.rehearse
    if rehearse:
        import tempfile

        asset_root = pathlib.Path(
            args.rehearse_dir or tempfile.mkdtemp(prefix="evr_parity_rehearse_")
        )
        env = build_rehearsal_assets(asset_root)
        os.environ.update(env)
        args.reference_root = env["EVR_TPU_REFERENCE_ROOT"]
        if args.out == "parity_real_report.json":
            args.out = "parity_rehearsal_report.json"
        print(f"rehearsal assets: {asset_root}")

    gates = []
    for fn in (
        _gate_bpe,
        lambda: _gate_clip_golden(args.reference_root),
        _gate_whisper,
        _gate_siglip_tokenizer,
    ):
        try:
            gates.append(fn())
        except Exception as e:  # a crashing gate is a FAILED gate
            gates.append({
                "gate": getattr(fn, "__name__", "gate").strip("_"),
                "status": "FAILED",
                "reason": f"{type(e).__name__}: {e}",
            })
    report = {
        "generated": datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat(),
        "gates": gates,
        "summary": {
            s.lower(): sum(1 for g in gates if g["status"] == s)
            for s in ("OK", "FAILED", "SKIPPED")
        },
    }
    if rehearse:
        for g in gates:
            g["mechanics"] = "PASS" if _rehearsal_mechanics(g) else "FAIL"
        report["rehearsal"] = True
        report["summary"]["mechanics_pass"] = sum(
            1 for g in gates if g["mechanics"] == "PASS"
        )
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        pathlib.Path(args.out).write_text(text + "\n", encoding="utf-8")
    if rehearse:
        return 0 if report["summary"]["mechanics_pass"] == len(gates) else 1
    return 1 if report["summary"]["failed"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
