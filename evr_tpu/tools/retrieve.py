"""Retrieval twin: load a model, embed a frame directory, run text queries,
dump ranked results.

Reference counterparts: `content/CLIP_finetune_HEAD/clip_contrastive_
retrieval.py` (`search_frames` at `:238-317`), `clip_multimodal_retrieval.
py`, `clip_image_retrieval.py` — checkpoint → frame dir → top-k grid +
JSON dump, with `violence_filter` probability filtering and
`retrieval_mode` switching.
"""

from __future__ import annotations

import argparse
import json
import pathlib


def main(argv=None):
    from evr_tpu.utils.platform_pin import pin_platform_from_env

    pin_platform_from_env()
    parser = argparse.ArgumentParser(description="CLIP frame retrieval")
    parser.add_argument("--frames-dir", required=True)
    parser.add_argument("--queries", nargs="+", required=True)
    parser.add_argument("--model", default="ViT-B/32")
    parser.add_argument("--checkpoint", default=None, help="fine-tuned checkpoint: .pt file or Trainer orbax dir")
    parser.add_argument("--top-k", type=int, default=10)
    parser.add_argument(
        "--retrieval-mode", choices=["contrastive", "classification"], default="contrastive"
    )
    parser.add_argument(
        "--use-ema", action="store_true",
        help="serve the EMA (Polyak-averaged) weights from the checkpoint "
        "(payload['ema'], written by finetune --ema-decay); falls back to "
        "the raw params when absent",
    )
    parser.add_argument(
        "--violence-filter",
        type=float,
        default=None,
        help="drop frames whose max(violence,sensitive) classifier prob is below this",
    )
    parser.add_argument("--output", default="retrieval_results.json")
    parser.add_argument("--grid", default=None, help="optional path for a result-grid PNG")
    parser.add_argument(
        "--aot-bundle", default=None,
        help="serve from an AOT StableHLO encoder bundle (serving/aot.py) — "
        "no model code runs; geometry comes from the bundle manifest, "
        "weights from --checkpoint (random-init demo otherwise)",
    )
    args = parser.parse_args(argv)

    import numpy as np

    from evr_tpu.index import EmbeddingEngine, FrameIndex

    if args.aot_bundle:
        if args.retrieval_mode == "classification" or args.violence_filter is not None:
            parser.error(
                "--aot-bundle supports contrastive retrieval only (the "
                "bundle carries the two encoders, not a classifier head)"
            )
        import jax

        from evr_tpu.serving.aot import AotEngine, config_from_manifest

        manifest = json.loads(
            (pathlib.Path(args.aot_bundle) / "manifest.json").read_text()
        )
        cfg = config_from_manifest(manifest)
        if args.checkpoint:
            from evr_tpu.models.torch_import import load_checkpoint

            params = load_checkpoint(args.checkpoint)["clip"]
        else:
            from evr_tpu.models import init_clip_params

            print("WARNING: no --checkpoint with --aot-bundle; random-init "
                  "weights (demo/smoke only)")
            params = init_clip_params(jax.random.PRNGKey(0), cfg)
        engine = AotEngine(args.aot_bundle, params)
    else:
        if args.checkpoint:
            # .pt file, Trainer orbax dir, or MoE orbax — all served
            engine = EmbeddingEngine.from_checkpoint(args.checkpoint, args.model, prefer_ema=args.use_ema)
        else:
            engine = EmbeddingEngine(args.model)

    emb, names = engine.embed_folder(args.frames_dir)
    index = FrameIndex(embed_dim=engine.cfg.embed_dim)
    index.add_video("query_set", emb, names)

    # None if no trained head (AotEngine has no classifier by design)
    probs = engine.classify(emb) if hasattr(engine, "classify") else None

    all_results = {}
    for query in args.queries:
        vec = engine.encode_texts([query])
        hits = index.search(vec, args.top_k * 3)[0]
        rows = []
        for hit in hits:
            row = {"frame": hit.frame_name, "similarity": hit.score}
            if probs is not None:
                p = probs[hit.frame_index]
                row["class_probs"] = [float(x) for x in p]
                if args.violence_filter is not None:
                    # classes: 0=Sensitive, 1=Violence, 2=NonViolence
                    if max(p[0], p[1]) < args.violence_filter:
                        continue
                if args.retrieval_mode == "classification":
                    row["score"] = float(max(p[0], p[1]))
            rows.append(row)
            if len(rows) >= args.top_k:
                break
        if args.retrieval_mode == "classification" and probs is not None:
            rows.sort(key=lambda r: r.get("score", 0), reverse=True)
        all_results[query] = rows
        print(f"'{query}': top {len(rows)} of {len(names)} frames, "
              f"best sim {rows[0]['similarity']:.4f}" if rows else f"'{query}': no results")

    pathlib.Path(args.output).write_text(json.dumps(all_results, indent=2))
    print(f"wrote {args.output}")

    if args.grid:
        _save_grid(args.frames_dir, all_results, args.grid)


def _save_grid(frames_dir, all_results, out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    queries = list(all_results)
    k = max((len(v) for v in all_results.values()), default=1)
    fig, axes = plt.subplots(len(queries), k, figsize=(2.2 * k, 2.6 * len(queries)), squeeze=False)
    for r, query in enumerate(queries):
        for c in range(k):
            ax = axes[r][c]
            ax.axis("off")
            if c < len(all_results[query]):
                row = all_results[query][c]
                img = Image.open(pathlib.Path(frames_dir) / row["frame"])
                ax.imshow(img)
                ax.set_title(f"{row['similarity']:.3f}", fontsize=7)
            if c == 0:
                ax.set_ylabel(query[:28], fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
