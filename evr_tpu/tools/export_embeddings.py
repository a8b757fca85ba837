"""Chunked embedding export for retrieval deployment.

Reference counterpart: the final export stage of
`training_CLIP_multimodal.py:787-886` — encode a frame corpus in chunks
(1000 frames/chunk) and write .npy + name manifest for the serving index.
"""

from __future__ import annotations

import argparse
import json
import pathlib


def main(argv=None):
    from evr_tpu.utils.platform_pin import pin_platform_from_env

    pin_platform_from_env()
    parser = argparse.ArgumentParser(description="export frame embeddings")
    parser.add_argument("--frames-dir", required=True)
    parser.add_argument("--out", required=True, help="output .npy path")
    parser.add_argument("--model", default="ViT-B/32")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument(
        "--use-ema", action="store_true",
        help="serve the EMA (Polyak-averaged) weights from the checkpoint "
        "(payload['ema'], written by finetune --ema-decay); falls back to "
        "the raw params when absent",
    )
    parser.add_argument("--chunk-size", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=256)
    args = parser.parse_args(argv)

    import numpy as np

    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.index.engine import IMAGE_EXTENSIONS

    if args.checkpoint:
        engine = EmbeddingEngine.from_checkpoint(
            args.checkpoint, args.model, batch_size=args.batch_size,
            prefer_ema=args.use_ema,
        )
    else:
        engine = EmbeddingEngine(args.model, batch_size=args.batch_size)

    frames_dir = pathlib.Path(args.frames_dir)
    names = sorted(
        p.name for p in frames_dir.iterdir() if p.suffix.lower() in IMAGE_EXTENSIONS
    )
    chunks = []
    for i in range(0, len(names), args.chunk_size):
        chunk = names[i : i + args.chunk_size]
        emb = engine.encode_image_files([frames_dir / n for n in chunk], normalise=True)
        chunks.append(emb)
        print(f"chunk {i // args.chunk_size}: {len(chunk)} frames")
    full = (
        np.concatenate(chunks, axis=0)
        if chunks
        else np.zeros((0, engine.cfg.embed_dim), np.float32)
    )
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.save(out, full)
    out.with_suffix(".names.json").write_text(json.dumps(names))
    print(f"wrote {out} {full.shape} and name manifest")


if __name__ == "__main__":
    main()
