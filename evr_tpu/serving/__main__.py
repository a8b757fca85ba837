"""CLI entry: ``python -m evr_tpu.serving --data-root data --port 5000``."""

import argparse


def main():
    parser = argparse.ArgumentParser(description="evr_tpu serving API")
    parser.add_argument("--data-root", default="data")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=5000)
    parser.add_argument("--model", default="ViT-B/32")
    parser.add_argument(
        "--model-family", choices=["clip", "siglip"], default="clip",
        help="siglip: serve a SigLIP tower (models/siglip.py) — --model "
        "then names a SIGLIP_REGISTRY geometry (e.g. "
        "siglip-base-patch16-224) or --siglip-hf points at a local HF "
        "checkout; text search needs a local SentencePiece tokenizer "
        "(--siglip-tokenizer), image search works without one",
    )
    parser.add_argument(
        "--siglip-hf", default=None,
        help="local transformers SiglipModel checkout to load weights from",
    )
    parser.add_argument(
        "--siglip-tokenizer", default=None,
        help="local transformers SiglipTokenizer path for text search",
    )
    parser.add_argument(
        "--checkpoint", default=None, help="optional fine-tuned .pt checkpoint"
    )
    parser.add_argument(
        "--use-ema", action="store_true",
        help="serve the EMA (Polyak-averaged) weights from the checkpoint "
        "(payload['ema'], written by finetune --ema-decay); falls back to "
        "the raw params when absent",
    )
    parser.add_argument(
        "--shard-index",
        action="store_true",
        help="shard the frame index + encode batches across all visible devices",
    )
    parser.add_argument(
        "--transcriber",
        choices=["none", "assemblyai"],
        default="none",
        help="voice-transcription provider (assemblyai reads ASSEMBLYAI_API_KEY)",
    )
    parser.add_argument(
        "--frontend-dist",
        default=None,
        help="serve a built SPA (e.g. the reference React app's dist/) at /app/",
    )
    parser.add_argument(
        "--index-dtype",
        choices=["float32", "bfloat16", "int8"],
        default="float32",
        help="HBM index storage dtype (bf16 halves / int8 quarters bandwidth)",
    )
    parser.add_argument(
        "--params-dtype",
        choices=["float32", "bfloat16", "int8", "auto"],
        default="float32",
        help="serving weight format: bf16 halves tower HBM; int8 quantizes "
        "the block linears onto the MXU's int8 path (+31%% encode "
        "throughput measured, rank-agreement gated — PERF.md); auto runs "
        "the rank-agreement gate over the ingested corpus at boot "
        "(models/quant_gate.py) and serves int8 only when it passes "
        "(bf16 otherwise)",
    )
    parser.add_argument(
        "--zeroshot-objects",
        action="store_true",
        help="annotate uploaded videos' object_detections with the TPU "
        "zero-shot detector (ingest/zeroshot.py: CLIP towers scoring a "
        "COCO-80 prompt-ensemble over a multi-scale region grid) — fills "
        "the schema the reference needs YOLOv8 for",
    )
    parser.add_argument(
        "--local-ocr", default="auto", choices=("auto", "on", "off"),
        help="annotate uploaded videos' text_detections with the "
        "zero-egress OCR (ingest/ocr.py: host line detector + TPU CTC "
        "recognizer) — fills the schema the reference needs EasyOCR for. "
        "auto = on when the committed checkpoint exists",
    )
    parser.add_argument(
        "--batch-window-ms",
        type=float,
        default=None,
        help="micro-batch window: concurrent semantic queries arriving within "
        "this many ms coalesce into ONE device dispatch (off when unset)",
    )
    parser.add_argument(
        "--search-impl",
        choices=["xla", "pallas", "ivf", "ivfpq"],
        default="xla",
        help="retrieval path: xla GEMM+top_k (exact, default), the fused "
        "Pallas tile streamer (exact, faster at multi-million-frame scale), "
        "ivf (approximate list probing, 10M+-row tier), or ivfpq (probed + "
        "PQ-compressed, 100M+-row tier) — PERF.md",
    )
    parser.add_argument(
        "--ivf-nprobe",
        type=int,
        default=32,
        help="lists probed per query under --search-impl ivf/ivfpq "
        "(nprobe = n_clusters is exact brute force)",
    )
    parser.add_argument(
        "--ivf-clusters",
        type=int,
        default=None,
        help="inverted-list count under ivf/ivfpq (default ~sqrt(N))",
    )
    parser.add_argument(
        "--ivfpq-host-store",
        action="store_true",
        help="two-tier ivfpq: device holds ONLY the PQ codes; re-rank rows "
        "live in host DRAM as int8 (for corpora whose fp32 originals don't "
        "fit HBM — re-ranked scores are int8-dequantized, PERF.md §100M)",
    )
    args = parser.parse_args()

    from werkzeug.serving import run_simple

    from evr_tpu.index import EmbeddingEngine
    from .app import create_app
    from .context import ServingContext

    mesh = None
    if args.shard_index:
        from evr_tpu.parallel import get_mesh

        mesh = get_mesh()
        print(f"sharding over {mesh.shape} mesh")
    transcriber = None
    if args.transcriber == "assemblyai":
        from .providers import AssemblyAITranscriber

        transcriber = AssemblyAITranscriber()
    if args.model_family == "siglip":
        from evr_tpu.index.siglip_engine import SiglipEngine
        from evr_tpu.models.siglip import get_siglip_config

        tokenize_fn = None
        if args.siglip_tokenizer:
            from transformers import SiglipTokenizer

            tok = SiglipTokenizer.from_pretrained(
                args.siglip_tokenizer, local_files_only=True
            )

            def tokenize_fn(texts):
                return tok(
                    texts, padding="max_length", truncation=True,
                    return_tensors="np",
                )["input_ids"]

        if args.siglip_hf:
            engine = SiglipEngine.from_hf(args.siglip_hf, tokenize_fn=tokenize_fn)
        else:
            engine = SiglipEngine(
                cfg=get_siglip_config(args.model), tokenize_fn=tokenize_fn
            )
    else:
        engine = EmbeddingEngine(
            args.model,
            mesh=mesh,
            params_dtype=(
                "float32" if args.params_dtype == "auto" else args.params_dtype
            ),
        )
        if args.checkpoint:
            engine.load_finetuned(args.checkpoint, prefer_ema=args.use_ema)
    from evr_tpu.utils import get_logger

    log = get_logger("evr_tpu.serving")
    annotators = []
    if args.zeroshot_objects:
        from evr_tpu.ingest.zeroshot import ZeroShotObjectAnnotator

        annotators.append(ZeroShotObjectAnnotator(engine))
    if args.local_ocr != "off":
        from evr_tpu.ingest.ocr import DEFAULT_CHECKPOINT, LocalOCRAnnotator

        if args.local_ocr == "on" or DEFAULT_CHECKPOINT.exists():
            annotators.append(LocalOCRAnnotator())
    if not annotators:
        annotator = None
    elif len(annotators) == 1:
        annotator = annotators[0]
    else:
        from evr_tpu.ingest.annotators import CompositeAnnotator

        annotator = CompositeAnnotator(*annotators)
    ctx = ServingContext(
        args.data_root,
        engine=engine,
        mesh=mesh,
        transcriber=transcriber,
        index_dtype=args.index_dtype,
        search_impl=args.search_impl,
        ivf_nprobe=args.ivf_nprobe,
        ivf_clusters=args.ivf_clusters,
        ivfpq_host_store=args.ivfpq_host_store,
        batch_window_ms=args.batch_window_ms,
        annotator=annotator,
    )
    loaded = ctx.boot()
    if args.params_dtype == "auto":
        if args.model_family == "siglip":
            parser.error("--params-dtype auto is CLIP-only; use int8/bfloat16 "
                         "explicitly for siglip")
        from evr_tpu.models.quant_gate import auto_params_dtype

        auto_params_dtype(engine, ctx.data_root, log=log)
    log.info(
        "serving %d videos (%d frames) from %s on %s:%d",
        len(loaded),
        sum(i.total_frames for i in ctx._indexes.values()),
        args.data_root,
        args.host,
        args.port,
    )
    run_simple(
        args.host, args.port, create_app(ctx, frontend_dist=args.frontend_dist),
        threaded=True,
    )


if __name__ == "__main__":
    main()
