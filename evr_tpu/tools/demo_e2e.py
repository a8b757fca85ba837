"""Minimum end-to-end slice (BASELINE config 1, CPU-runnable): embed N
JPEG frames + M text queries → cosine top-10, with stage timings.

``python -m evr_tpu.tools.demo_e2e --n-frames 1000 --synthetic`` generates
the frames; point ``--frames-dir`` at a real folder otherwise. This is the
perpetual regression anchor SURVEY.md §7 step 4 calls for.
"""

from __future__ import annotations

import argparse
import pathlib
import tempfile
import time

DEFAULT_QUERIES = [
    "a person fighting on the street",
    "a weapon being held",
    "a crowd gathering",
    "a calm everyday scene",
    "smoke and fire",
    "a vehicle moving fast",
    "people running away",
    "an empty road at night",
    "two people arguing",
    "a peaceful park",
]


def _make_synthetic_frames(out_dir: pathlib.Path, n: int) -> None:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:240, 0:320]
    for i in range(n):
        arr = np.stack(
            [
                127 + 120 * np.sin(xx / (10 + (i % 37))),
                127 + 120 * np.cos(yy / (8 + (i % 23))),
                (xx + yy + 13 * i) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)
        Image.fromarray(arr).save(out_dir / f"{i}.jpg", quality=88)


def main(argv=None):
    from evr_tpu.utils.platform_pin import pin_platform_from_env

    pin_platform_from_env()
    parser = argparse.ArgumentParser(description="end-to-end retrieval slice")
    parser.add_argument("--frames-dir", default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--n-frames", type=int, default=1000)
    parser.add_argument("--model", default="ViT-B/32")
    parser.add_argument("--queries", nargs="*", default=DEFAULT_QUERIES)
    parser.add_argument("--top-k", type=int, default=10)
    args = parser.parse_args(argv)

    from evr_tpu.index import EmbeddingEngine, FrameIndex

    if args.frames_dir is None or args.synthetic:
        tmp = tempfile.mkdtemp(prefix="evr_demo_")
        frames_dir = pathlib.Path(tmp)
        print(f"generating {args.n_frames} synthetic frames in {frames_dir} …")
        _make_synthetic_frames(frames_dir, args.n_frames)
    else:
        frames_dir = pathlib.Path(args.frames_dir)

    engine = EmbeddingEngine(args.model)

    t0 = time.perf_counter()
    emb, names = engine.embed_folder(frames_dir)
    t_embed = time.perf_counter() - t0
    print(f"embedded {len(names)} frames in {t_embed:.2f}s ({len(names)/t_embed:.1f} fps)")

    index = FrameIndex(embed_dim=engine.cfg.embed_dim)
    index.add_video("demo", emb, names)

    t0 = time.perf_counter()
    vecs = engine.encode_texts(args.queries)
    results = index.search(vecs, args.top_k)
    t_query = time.perf_counter() - t0
    for query, hits in zip(args.queries, results):
        top = ", ".join(f"{h.frame_name}:{h.score:.3f}" for h in hits[:3])
        print(f"  {query!r} → {top} …")
    print(
        f"{len(args.queries)} queries in {t_query*1e3:.1f} ms "
        f"({t_query*1e3/len(args.queries):.1f} ms/query)"
    )


if __name__ == "__main__":
    main()
