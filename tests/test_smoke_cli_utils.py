"""Smoke coverage for previously-untested CLIs and utils.

Added after an argparse-flag regression shipped in `tools/diagnose.py`
with zero test signal (the `--use-ema` flag landed after `parse_args`, so
`--checkpoint` runs crashed with AttributeError): every CLI entry point
must at least run end-to-end on the tiny geometry.
"""

import json
import logging

import numpy as np
import pytest


def test_diagnose_cli_runs_and_reports(capsys, tmp_path):
    from evr_tpu.tools import diagnose

    diagnose.main(["--model", "ViT-Tiny-Test", "--batch-sizes", "1", "4"])
    out = capsys.readouterr().out
    report = json.loads(out[out.index("{"):])
    assert report["ok"] is True
    assert "freeze_audit" in report or "embedding_norms" in report


def test_diagnose_cli_with_ema_checkpoint(capsys, tmp_path):
    """--checkpoint --use-ema path (the exact flags the shipped regression
    broke): train 1 step with EMA, diagnose the checkpoint."""
    import jax

    from evr_tpu.models import get_model_config, init_clip_params
    from evr_tpu.tools import diagnose
    from evr_tpu.training import TrainConfig, Trainer

    cfg = get_model_config("ViT-Tiny-Test")
    tc = TrainConfig(
        freeze_layers=0, batch_size=4, compute_dtype="float32",
        ema_decay=0.9, save_dir=str(tmp_path),
    )
    tr = Trainer(cfg, init_clip_params(jax.random.PRNGKey(0), cfg), tc,
                 log_fn=lambda s: None)
    rng = np.random.default_rng(0)
    tokens = np.zeros((4, cfg.text.context_length), np.int32)
    tokens[:, 0] = 1
    tokens[:, 1] = cfg.text.vocab_size - 1
    batch = {
        "images": (rng.random((4, cfg.vision.image_size, cfg.vision.image_size, 3))
                   * 255).astype(np.uint8),
        "tokens": tokens,
        "labels": np.zeros((4,), np.int32),
    }
    tr.state, _ = tr.train_step(
        tr.state, {k: np.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(0),
    )
    tr.save_checkpoint("diag", epoch=0, metrics={})

    diagnose.main([
        "--model", "ViT-Tiny-Test",
        "--checkpoint", str(tmp_path / "diag"),
        "--use-ema", "--batch-sizes", "1",
    ])
    out = capsys.readouterr().out
    assert json.loads(out[out.index("{"):])


def test_demo_e2e_synthetic(capsys):
    from evr_tpu.tools import demo_e2e

    demo_e2e.main([
        "--synthetic", "--n-frames", "6", "--model", "ViT-Tiny-Test",
        "--queries", "a red frame", "--top-k", "3",
    ])
    out = capsys.readouterr().out
    assert "embedded 6 frames" in out
    assert "ms/query" in out


def test_structured_logging(capsys):
    from evr_tpu.utils.logging import get_logger

    log = get_logger("evr_test_json", json_format=True)
    log.info("hello %s", "world")
    err = capsys.readouterr().err
    rec = json.loads(err.strip().splitlines()[-1])
    assert rec["msg"] == "hello world"
    assert rec["level"] == "INFO"


def test_profiling_spans():
    from evr_tpu.utils.profiling import Timer, span

    Timer.reset()
    with span("unit_span"):
        sum(range(1000))
    rep = Timer.report()
    assert "unit_span" in rep
    assert rep["unit_span"]["count"] == 1
    assert rep["unit_span"]["p50_ms"] >= 0


def test_platform_pin_honors_env(monkeypatch):
    import jax

    from evr_tpu.utils.platform_pin import pin_platform_from_env

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert pin_platform_from_env() == "cpu"
    assert jax.config.jax_platforms == "cpu"


def test_composite_annotator_merges():
    from evr_tpu.ingest.annotators import CompositeAnnotator

    a = lambda p: {"text_detections": [{"text": "A"}], "object_detections": []}
    b = lambda p: {"object_detections": [{"class": "dog"}]}
    out = CompositeAnnotator(a, b)("x.jpg")
    assert out["text_detections"] == [{"text": "A"}]
    assert out["object_detections"] == [{"class": "dog"}]


def test_bench_kernels_captioner_smoke(capsys):
    """bench_kernels' captioner mode runs end to end (CPU smoke shape)."""
    import sys

    from evr_tpu.tools import bench_kernels

    argv = sys.argv
    sys.argv = ["bench_kernels", "captioner", "--reps", "10"]
    try:
        bench_kernels.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "kv-cached decode" in out and "speedup" in out


def test_bench_kernels_ivf_smoke(capsys):
    """bench_kernels' ivf mode runs end to end (CPU smoke corpus)."""
    from evr_tpu.tools import bench_kernels

    bench_kernels.bench_ivf(reps=1, ns=(2000,), d=32)
    out = capsys.readouterr().out
    assert "brute GEMM" in out and "recall@10" in out


def test_bench_kernels_pq_smoke(capsys):
    """bench_kernels' pq mode runs end to end (CPU smoke corpus)."""
    from evr_tpu.tools import bench_kernels

    bench_kernels.bench_pq(reps=1, ns=(1500,), d=32)
    out = capsys.readouterr().out
    assert "brute fp32" in out and "recall@10" in out and "rerank" in out


def test_bench_kernels_ivfpq_smoke(capsys):
    """bench_kernels' ivfpq mode runs end to end (CPU smoke corpus)."""
    from evr_tpu.tools import bench_kernels

    bench_kernels.bench_ivfpq(reps=1, ns=(2000,), d=32)
    out = capsys.readouterr().out
    assert "ivfpq" in out and "recall@10" in out


def test_index_tool_build_and_query_roundtrip(tmp_path, capsys):
    """index_tool CLI: build each tier from a .npy, query the persisted
    artifact, top hit = the query's own row."""
    import json
    import sys

    import numpy as np

    from evr_tpu.tools import index_tool

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((300, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb_path = tmp_path / "emb.npy"
    np.save(emb_path, emb)
    q_path = tmp_path / "q.npy"
    np.save(q_path, emb[:3])

    for typ, extra in [
        ("ivf", ["--clusters", "8"]),
        ("pq", ["--subspaces", "8", "--centroids", "32"]),
        ("ivfpq", ["--clusters", "8", "--subspaces", "8", "--centroids", "32"]),
    ]:
        out = tmp_path / f"{typ}.npz"
        argv = sys.argv
        try:
            sys.argv = ["index_tool", "build", "--embeddings", str(emb_path),
                        "--type", typ, "--out", str(out), "--iters", "4"] + extra
            index_tool.main()
            built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
            assert built["rows"] == 300 and out.exists()

            sys.argv = ["index_tool", "query", "--index", str(out),
                        "--type", typ, "--query-embeddings", str(q_path),
                        "--top-k", "3", "--nprobe", "8", "--rerank", "50"]
            index_tool.main()
            lines = [json.loads(l) for l in
                     capsys.readouterr().out.strip().splitlines()]
            hits = [l for l in lines if "hits" in l]
            assert len(hits) == 3
            for qi, h in enumerate(hits):
                assert h["hits"][0]["row"] == qi, (typ, h)
        finally:
            sys.argv = argv
