"""Offline ingestion CLI: videos → durable index artefacts.

``python -m evr_tpu.tools.ingest --data-root data video1.mp4 video2.mp4``
produces the same {name}_embeddings.npy / {name}_metadata.json /
video_mapping.json layout the serving tier boots from.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from evr_tpu.utils.platform_pin import pin_platform_from_env

    pin_platform_from_env()
    parser = argparse.ArgumentParser(description="ingest videos into a data root")
    parser.add_argument("videos", nargs="+")
    parser.add_argument("--data-root", default="data")
    parser.add_argument("--model", default="ViT-B/32")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument(
        "--use-ema", action="store_true",
        help="serve the EMA (Polyak-averaged) weights from the checkpoint "
        "(payload['ema'], written by finetune --ema-decay); falls back to "
        "the raw params when absent",
    )
    parser.add_argument("--scene-threshold", type=float, default=30.0)
    parser.add_argument("--uniform", type=int, default=None,
                        help="use uniform sampling of N frames instead of scene detection")
    parser.add_argument(
        "--zeroshot-objects", action="store_true",
        help="fill object_detections with the TPU zero-shot detector "
        "(ingest/zeroshot.py; COCO-80 vocabulary over the CLIP towers) — "
        "no YOLO install needed",
    )
    parser.add_argument(
        "--local-ocr", default="auto", choices=("auto", "on", "off"),
        help="fill text_detections with the zero-egress OCR "
        "(ingest/ocr.py; CTC recognizer over host-detected line boxes) — "
        "no EasyOCR install needed. auto = on when the committed "
        "checkpoint exists (it ships with the repo)",
    )
    args = parser.parse_args(argv)

    from evr_tpu.config import DataRootConfig
    from evr_tpu.index import EmbeddingEngine, FrameIndex, VideoRegistry
    from evr_tpu.ingest import extract_uniform_frames, ingest_video
    from evr_tpu.query import MetadataStore

    if args.checkpoint:
        engine = EmbeddingEngine.from_checkpoint(args.checkpoint, args.model, prefer_ema=args.use_ema)
    else:
        engine = EmbeddingEngine(args.model)
    data_root = DataRootConfig(args.data_root).ensure()
    registry = VideoRegistry(data_root.mapping_path)
    index = FrameIndex(embed_dim=engine.cfg.embed_dim)
    store = MetadataStore()
    annotators = []
    if args.zeroshot_objects:
        from evr_tpu.ingest.zeroshot import ZeroShotObjectAnnotator

        annotators.append(ZeroShotObjectAnnotator(engine))
    if args.local_ocr != "off":
        from evr_tpu.ingest.ocr import DEFAULT_CHECKPOINT, LocalOCRAnnotator

        if args.local_ocr == "on" or DEFAULT_CHECKPOINT.exists():
            annotators.append(LocalOCRAnnotator())
    annotator = None
    if annotators:
        if len(annotators) == 1:
            annotator = annotators[0]
        else:
            from evr_tpu.ingest.annotators import CompositeAnnotator

            annotator = CompositeAnnotator(*annotators)

    for video in args.videos:
        if args.uniform:
            import pathlib

            name = pathlib.Path(video).stem
            frames_dir = data_root.frames_dir / name
            extract_uniform_frames(video, frames_dir, args.uniform)
        result = ingest_video(
            video, data_root, engine, index, registry, store,
            annotator=annotator, scene_threshold=args.scene_threshold,
        )
        print(
            f"{result.video_name}: {result.n_frames} frames, fps={result.fps:.2f} → "
            f"{result.embeddings_file}"
        )
    print(f"index now holds {index.total_frames} frames across {len(index.videos)} videos")


if __name__ == "__main__":
    main()
