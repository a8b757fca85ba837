"""On-chip Whisper transcription CLI (the voice-search pillar, offline).

Reference counterpart: `Backend/app.py:766-850` — the route writes the
uploaded recording to a temp file and ships it to AssemblyAI over the
network with a hardcoded API key. This tool runs the same job on the local
accelerator through ``evr_tpu.models.whisper``: WAV in, transcript (or raw
token ids when no tokenizer assets are wired) out.

Weights are a deployment asset: pass an HF Whisper checkpoint state dict
(``--hf-checkpoint model.pt``, e.g. ``torch.save(model.state_dict(),...)``
of any ``openai/whisper-*``) plus its ``--size``. With ``--tokenizer-dir``
pointing at HF WhisperTokenizer assets the output is real-vocab text;
otherwise the deterministic byte-level fallback detokenizer
(`tokenizer/fallbacks.WhisperFallbackTokenizer`, explicitly non-parity)
keeps the output textual and the transcript artifacts searchable —
``--raw-ids`` restores the id-list output as the parity oracle.
"""

from __future__ import annotations

import argparse
import json


def _load_detokenizer(tokenizer_dir: str):
    try:
        from transformers import WhisperTokenizer
    except ImportError as e:  # pragma: no cover - transformers is baked in
        raise SystemExit(f"--tokenizer-dir needs transformers: {e}")
    tok = WhisperTokenizer.from_pretrained(tokenizer_dir)
    return lambda ids: tok.decode(ids, skip_special_tokens=True)


def main(argv=None):
    from evr_tpu.utils.platform_pin import pin_platform_from_env

    pin_platform_from_env()
    parser = argparse.ArgumentParser(description="Whisper transcription on TPU")
    parser.add_argument("audio", nargs="+", help="PCM WAV file(s)")
    parser.add_argument("--size", default="tiny", help="whisper geometry name")
    parser.add_argument("--hf-checkpoint", default=None,
                        help="torch state-dict file of an HF Whisper model")
    parser.add_argument("--random-init", action="store_true",
                        help="random weights (compute-path smoke, ids only)")
    parser.add_argument("--tokenizer-dir", default=None,
                        help="HF WhisperTokenizer assets dir (real-vocab text)")
    parser.add_argument("--raw-ids", action="store_true",
                        help="print raw token ids instead of the byte-level "
                        "fallback detokenization (parity-oracle mode)")
    parser.add_argument("--prompt-ids", type=int, nargs="+", default=None,
                        help="forced header token ids (default: [sot])")
    parser.add_argument("--max-len", type=int, default=224)
    parser.add_argument("--json", action="store_true", dest="as_json")
    parser.add_argument(
        "--segments-out", default=None, metavar="DIR",
        help="write searchable transcript artifacts ({video}_transcript.json, "
        "ingest/transcripts.py schema) into DIR instead of printing text; "
        "the video name is the WAV stem. Point DIR at the metadata dir and "
        "the serving boot picks them up for speech search automatically",
    )
    args = parser.parse_args(argv)

    from evr_tpu.models.whisper import (
        WHISPER_SIZES,
        WhisperASR,
        from_hf_whisper_state_dict,
        init_whisper_params,
        read_wav,
    )

    if args.size not in WHISPER_SIZES:
        raise SystemExit(
            f"unknown --size {args.size!r}; choose from {sorted(WHISPER_SIZES)}"
        )
    cfg = WHISPER_SIZES[args.size]

    if args.hf_checkpoint:
        import torch

        sd = torch.load(args.hf_checkpoint, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params = from_hf_whisper_state_dict(
            {k: v.numpy() for k, v in sd.items()}, cfg
        )
    elif args.random_init:
        import jax

        params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    else:
        raise SystemExit("need --hf-checkpoint (or --random-init for a smoke run)")

    if args.tokenizer_dir:
        detok = _load_detokenizer(args.tokenizer_dir)
    elif args.raw_ids:
        detok = None
    else:
        # zero-egress default: the deterministic byte-level fallback
        # (tokenizer/fallbacks.py) — NON-parity; real text needs the vocab
        detok = "fallback"
    prompt = args.prompt_ids if args.prompt_ids is not None else [cfg.sot_id]
    asr = WhisperASR(params, cfg, prompt_ids=prompt, max_len=args.max_len,
                     detokenize=detok)

    if args.segments_out:
        import pathlib

        from evr_tpu.ingest.transcripts import (
            WhisperSegmentTranscriber,
            build_video_transcript,
        )

        out_dir = pathlib.Path(args.segments_out)
        transcriber = WhisperSegmentTranscriber(asr, prompt_ids=args.prompt_ids)
        results = {}
        for path in args.audio:
            name = pathlib.Path(path).stem
            out_path = out_dir / f"{name}_transcript.json"
            payload = build_video_transcript(
                path, name, transcriber, out_path, cfg.sampling_rate
            )
            results[path] = payload
            print(f"wrote {out_path} ({len(payload['segments'])} segments)")
        return results

    results = {}
    for path in args.audio:
        audio = read_wav(path, cfg.sampling_rate)
        (out,) = asr.transcribe(audio)
        results[path] = out
        if not args.as_json:
            print(f"{path}: {out}")
    if args.as_json:
        print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
