"""Boot the full serving stack over the reference's REAL fixture corpus for
an end-to-end browser drive of the built-in product UI (`serving/ui.py`).

Seeds a relocatable data root from `/root/reference/Backend/{metadata,
embedding,static/processed_frames}` (fixtures are DATA — never code),
synthesizes playable MP4s whose frame counts cover every metadata
`frameidx` (so player timestamps stay inside the duration), and serves on
CPU with a small random-init CLIP tower (embed_dim=512 to match the
fixture embeddings; keyword/object/speech searches read the real fixture
metadata, so those results are the reference's own annotations).

Usage:  python tools/drive_ui_server.py [--port 5055] [--root /tmp/ui_drive]
"""

import argparse
import json
import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

REF = pathlib.Path("/root/reference/Backend")
VIDEOS = ["Violence", "Violence_2", "video_test_3", "video_test_4"]


def seed_data_root(root: pathlib.Path) -> pathlib.Path:
    import shutil

    import cv2
    import numpy as np

    from evr_tpu.config import DataRootConfig

    data = DataRootConfig(root / "data").ensure()
    mapping = {}
    for name in VIDEOS:
        meta_src = REF / "metadata" / f"{name}_metadata.json"
        emb_src = REF / "embedding" / f"{name}_embeddings.npy"
        frames_src = REF / "static" / "processed_frames" / name
        meta_dst = data.metadata_dir / meta_src.name
        emb_dst = data.embedding_dir / emb_src.name
        frames_dst = data.frames_dir / name
        shutil.copy(meta_src, meta_dst)
        shutil.copy(emb_src, emb_dst)
        if not frames_dst.exists():
            frames_dst.symlink_to(frames_src)

        video_dst = data.video_dir / f"{name}.mp4"
        if not video_dst.exists():
            recs = json.loads(meta_src.read_text(encoding="utf-8"))
            n = max(r.get("frameidx", 0) for r in recs) + 48
            w = cv2.VideoWriter(
                str(video_dst), cv2.VideoWriter_fourcc(*"mp4v"), 24.0, (48, 48)
            )
            f = np.zeros((48, 48, 3), np.uint8)
            for i in range(n):
                f[:, :, i % 3] = (i * 7) % 255
                w.write(f)
            w.release()
        mapping[name] = {
            "metadata_file": str(meta_dst),
            "embeddings_file": str(emb_dst),
            "video_path": str(video_dst),
            "frames_dir": str(frames_dst),
        }
    data.mapping_path.write_text(json.dumps(mapping, indent=2))
    return data.root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=5055)
    ap.add_argument("--root", default="/tmp/ui_drive")
    args = ap.parse_args()

    root = pathlib.Path(args.root)
    data_root = seed_data_root(root)

    from werkzeug.serving import run_simple

    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
    from evr_tpu.serving import ServingContext, create_app

    # embed_dim must be 512 to score the real fixture embeddings; the towers
    # are small random-init (this drive exercises the product loop, not
    # model quality — keyword/object search results are the REAL fixture
    # annotations and need no weights at all).
    cfg = CLIPConfig(
        embed_dim=512,
        vision=VisionConfig(image_size=64, patch_size=16, width=128, layers=2,
                            heads=4),
        text=TextConfig(width=128, layers=2, heads=4),
    )
    ctx = ServingContext(
        data_root, engine=EmbeddingEngine(cfg=cfg, batch_size=16)
    )
    loaded = ctx.boot()
    total = sum(i.total_frames for i in ctx._indexes.values())
    print(f"booted {len(loaded)} fixture videos, {total} frames", flush=True)
    print(f"UI at http://127.0.0.1:{args.port}/", flush=True)
    sys.stdout.flush()
    run_simple("127.0.0.1", args.port, create_app(ctx), threaded=True)


if __name__ == "__main__":
    main()
