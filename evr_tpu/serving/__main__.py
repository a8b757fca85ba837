"""CLI entry: ``python -m evr_tpu.serving --data-root data --port 5000``."""

import argparse


def main():
    parser = argparse.ArgumentParser(description="evr_tpu serving API")
    parser.add_argument("--data-root", default="data")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=5000)
    parser.add_argument("--model", default="ViT-B/32")
    parser.add_argument(
        "--checkpoint", default=None, help="optional fine-tuned .pt checkpoint"
    )
    args = parser.parse_args()

    from werkzeug.serving import run_simple

    from evr_tpu.index import EmbeddingEngine
    from .app import create_app
    from .context import ServingContext

    engine = EmbeddingEngine(args.model)
    if args.checkpoint:
        engine.load_finetuned(args.checkpoint)
    ctx = ServingContext(args.data_root, engine=engine)
    loaded = ctx.boot()
    print(f"serving {len(loaded)} videos from {args.data_root}")
    run_simple(args.host, args.port, create_app(ctx), threaded=True)


if __name__ == "__main__":
    main()
