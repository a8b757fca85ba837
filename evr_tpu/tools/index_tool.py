"""Build / query standalone ANN indexes over an embeddings matrix.

The serving path gets the tiers via ``FrameIndex(search_impl=...)``; this
CLI covers the offline workflow — build once from a ``.npy`` embedding
matrix (e.g. an `export_embeddings` artifact), persist the index, query it
later without rebuilding. No reference counterpart (the reference
brute-forces numpy at query time, `Backend/services/embedding_service.py`).

    # build (type: ivf | pq | ivfpq)
    python -m evr_tpu.tools.index_tool build --embeddings emb.npy \\
        --type ivfpq --out idx.npz --clusters 1024 --subspaces 64

    # query with text (needs a model) or a query-embedding matrix
    python -m evr_tpu.tools.index_tool query --index idx.npz --type ivfpq \\
        --query-embeddings q.npy --top-k 10 --nprobe 32 --rerank 200
"""

from __future__ import annotations

import argparse
import json
import time


def _load_normed(path):
    import numpy as np

    emb = np.load(path).astype(np.float32)
    if emb.ndim != 2:
        raise SystemExit(f"{path}: expected a 2-D embedding matrix, got {emb.shape}")
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    return emb / np.maximum(norms, 1e-12)


def cmd_build(args) -> None:
    if args.type == "ivfpq" and args.streamed:
        import numpy as np

        n, dim = np.load(args.embeddings, mmap_mode="r").shape
        emb = None
    else:
        emb = _load_normed(args.embeddings)
        n, dim = emb.shape
    t0 = time.perf_counter()
    if args.type == "ivf":
        from evr_tpu.index import IVFIndex

        idx = IVFIndex().build(
            emb,
            n_clusters=min(args.clusters or max(1, int(round(n**0.5))), n),
            capacity_factor=args.capacity_factor,
            iters=args.iters,
        )
        extra = {"n_clusters": idx.n_clusters}
    elif args.type == "pq":
        from evr_tpu.index import PQIndex

        idx = PQIndex().build(
            emb,
            n_subspaces=args.subspaces,
            n_centroids=args.centroids,
            iters=args.iters,
            opq_iters=args.opq_iters,
            keep_originals=not args.no_originals,
        )
        extra = {"code_bytes_per_row": idx.code_bytes // max(1, n)}
    elif args.type == "ivfpq" and args.streamed:
        import numpy as np

        import jax.numpy as jnp

        from evr_tpu.index import IVFPQIndex

        raw = np.load(args.embeddings, mmap_mode="r")
        n, d = raw.shape

        def slab_fn(start, m):
            s = np.array(raw[start : start + m], np.float32)  # owns memory
            s /= np.maximum(np.linalg.norm(s, axis=1, keepdims=True), 1e-12)
            return jnp.asarray(s)

        idx = IVFPQIndex().build_device_streamed(
            slab_fn, n, d,
            n_clusters=min(
                args.clusters or max(1, int(round(n**0.5))), n
            ),
            n_subspaces=args.subspaces,
            n_centroids=args.centroids,
            capacity_factor=args.capacity_factor,
            coarse_iters=args.iters,
            pq_iters=args.iters,
            opq_iters=args.opq_iters,
            slab_rows=min(args.slab_rows, n),
        )
        extra = {
            "n_clusters": idx.n_clusters,
            "code_bytes_per_row": idx.code_bytes // max(1, n) + 4,
            "streamed": True,
        }
        if args.host_store:
            # two-tier rerank store: int8 rows + per-row scales as flat
            # .npy pairs, written slab-wise so a 100M-row corpus (51 GB)
            # never needs to fit in RAM at once
            rows_path = args.host_store + ".rows.npy"
            scales_path = args.host_store + ".scales.npy"
            rows8 = np.lib.format.open_memmap(
                rows_path, mode="w+", dtype=np.int8, shape=(n, d)
            )
            scales = np.lib.format.open_memmap(
                scales_path, mode="w+", dtype=np.float32, shape=(n,)
            )
            for start in range(0, n, args.slab_rows):
                s = np.array(raw[start : start + args.slab_rows], np.float32)
                s /= np.maximum(
                    np.linalg.norm(s, axis=1, keepdims=True), 1e-12
                )
                sc = np.maximum(np.abs(s).max(axis=1) / 127.0, 1e-12)
                rows8[start : start + len(s)] = np.round(
                    s / sc[:, None]
                ).astype(np.int8)
                scales[start : start + len(s)] = sc
            rows8.flush()
            scales.flush()
            extra["host_store"] = args.host_store
    else:
        from evr_tpu.index import IVFPQIndex

        idx = IVFPQIndex().build(
            emb,
            n_clusters=min(args.clusters or max(1, int(round(n**0.5))), n),
            n_subspaces=args.subspaces,
            n_centroids=args.centroids,
            capacity_factor=args.capacity_factor,
            coarse_iters=args.iters,
            pq_iters=args.iters,
            keep_originals=not args.no_originals,
        )
        extra = {
            "n_clusters": idx.n_clusters,
            "code_bytes_per_row": idx.code_bytes // max(1, n) + 4,
        }
    idx.save(args.out)
    print(json.dumps({
        "type": args.type, "rows": n, "dim": int(dim),
        "build_s": round(time.perf_counter() - t0, 2), "out": args.out,
        **extra,
    }))


def cmd_query(args) -> None:
    import numpy as np

    if args.type == "ivf":
        from evr_tpu.index import IVFIndex as cls
    elif args.type == "pq":
        from evr_tpu.index import PQIndex as cls
    else:
        from evr_tpu.index import IVFPQIndex as cls
    idx = cls.load(args.index)
    if args.type == "ivfpq" and args.host_store:
        # memmapped two-tier store: search(rerank=) gathers only the
        # candidate rows, so the store never loads into RAM wholesale
        rows8 = np.load(args.host_store + ".rows.npy", mmap_mode="r")
        scales = np.load(args.host_store + ".scales.npy", mmap_mode="r")
        idx.attach_host_store(rows8, scales)

    if args.query_embeddings:
        q = _load_normed(args.query_embeddings)
    elif args.query:
        from evr_tpu.index import EmbeddingEngine

        engine = EmbeddingEngine(args.model)
        if args.checkpoint:
            engine.load_finetuned(args.checkpoint)
        q = np.stack([engine.get_text_features(t).reshape(-1) for t in args.query])
    else:
        raise SystemExit("provide --query-embeddings or --query")

    kw = {}
    if args.type in ("ivf", "ivfpq"):
        kw["nprobe"] = args.nprobe
    if args.type in ("pq", "ivfpq") and args.rerank:
        kw["rerank"] = args.rerank
    t0 = time.perf_counter()
    scores, rows = idx.search(q, args.top_k, **kw)
    ms = (time.perf_counter() - t0) * 1000
    for qi in range(len(q)):
        hits = [
            {"row": int(r), "score": round(float(s), 4)}
            for s, r in zip(scores[qi], rows[qi])
            if r >= 0
        ]
        print(json.dumps({"query": qi, "hits": hits}))
    print(json.dumps({"batch_ms": round(ms, 2), "queries": len(q)}))


def main() -> None:
    from evr_tpu.utils.platform_pin import pin_platform_from_env

    pin_platform_from_env()
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build + persist an index")
    b.add_argument("--embeddings", required=True, help=".npy [N, D] matrix")
    b.add_argument("--type", choices=["ivf", "pq", "ivfpq"], required=True)
    b.add_argument("--out", required=True, help="output .npz path")
    b.add_argument("--clusters", type=int, default=None, help="default ~sqrt(N)")
    b.add_argument("--subspaces", type=int, default=64)
    b.add_argument("--centroids", type=int, default=256)
    b.add_argument("--capacity-factor", type=float, default=1.3)
    b.add_argument("--iters", type=int, default=10, help="k-means iterations")
    b.add_argument("--opq-iters", type=int, default=0,
                   help="PQ only: OPQ rotation refinement rounds")
    b.add_argument("--streamed", action="store_true",
                   help="ivfpq: corpus-free streamed device build "
                   "(memmaps the .npy; the 100M-row tier where neither "
                   "host RAM nor HBM holds the matrix)")
    b.add_argument("--slab-rows", type=int, default=500_000,
                   help="streamed build slab size")
    b.add_argument("--host-store", default=None, metavar="PREFIX",
                   help="also write PREFIX.rows.npy (int8) + "
                   "PREFIX.scales.npy — the host-DRAM exact-rerank tier "
                   "(query --host-store PREFIX --rerank R)")
    b.add_argument("--no-originals", action="store_true",
                   help="pq/ivfpq: drop the fp32 originals (no exact re-rank)")
    b.set_defaults(fn=cmd_build)

    qp = sub.add_parser("query", help="query a persisted index")
    qp.add_argument("--index", required=True)
    qp.add_argument("--type", choices=["ivf", "pq", "ivfpq"], required=True)
    qp.add_argument("--query", nargs="*", default=None, help="text queries")
    qp.add_argument("--query-embeddings", default=None, help=".npy [B, D]")
    qp.add_argument("--model", default="ViT-B/32")
    qp.add_argument("--checkpoint", default=None)
    qp.add_argument("--top-k", type=int, default=10)
    qp.add_argument("--nprobe", type=int, default=32)
    qp.add_argument("--rerank", type=int, default=None)
    qp.add_argument("--host-store", default=None, metavar="PREFIX",
                    help="attach the memmapped int8 rerank store written "
                    "by build --host-store (ivfpq)")
    qp.set_defaults(fn=cmd_query)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
