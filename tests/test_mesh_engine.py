"""Mesh-sharded engine encoding (dp ingestion/eval), viz PNG render, and
profiler utilities."""

import numpy as np
import pytest

import jax

from evr_tpu.index import EmbeddingEngine
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
from evr_tpu.parallel import get_mesh


def small_cfg():
    return CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )


def test_mesh_engine_matches_single_device(rng):
    cfg = small_cfg()
    single = EmbeddingEngine(cfg=cfg, batch_size=8)
    mesh = get_mesh(len(jax.devices()))
    sharded = EmbeddingEngine(
        cfg=cfg, params=single.params, batch_size=8, mesh=mesh
    )
    staged = (rng.random((8, 32, 32, 3)) * 255).astype(np.uint8)
    a = single.encode_staged_images(staged)
    b = sharded.encode_staged_images(staged)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    t1 = single.encode_texts(["hello world", "a cat", "dog", "bird",
                              "x", "y", "z", "w"])
    t2 = sharded.encode_texts(["hello world", "a cat", "dog", "bird",
                               "x", "y", "z", "w"])
    np.testing.assert_allclose(t1, t2, rtol=1e-5, atol=1e-6)


def test_sharded_serving_context(tmp_path, rng):
    """ServingContext with a mesh: ingest + all search paths still work with
    the index sharded across devices."""
    import cv2

    from evr_tpu.config import DataRootConfig
    from evr_tpu.serving import ServingContext

    video = tmp_path / "v.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 64))
    for i in range(40):
        f = np.zeros((64, 64, 3), np.uint8)
        f[:, :, 0 if i < 20 else 2] = 200
        w.write(f)
    w.release()

    cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    mesh = get_mesh(len(jax.devices()))
    ctx = ServingContext(
        DataRootConfig(tmp_path / "data"),
        engine=EmbeddingEngine(cfg=cfg, batch_size=8, mesh=mesh),
        mesh=mesh,
    )
    ctx.ingest(video)
    results = ctx.query_engine.query_text_clip("red scene", top_k=2)
    assert len(results) == 2
    assert all(np.isfinite(r["clip_similarity"]) for r in results)


def test_render_scatter(tmp_path, rng):
    from evr_tpu.viz.projection import render_scatter

    result = {
        "coordinates": rng.normal(size=(30, 2)).tolist(),
        "video_labels": ["a"] * 15 + ["b"] * 15,
        "videos": ["a", "b"],
        "dimensionality_reduction": {"method": "pca"},
    }
    out = render_scatter(result, tmp_path / "viz.png")
    assert out is not None and (tmp_path / "viz.png").stat().st_size > 0


def test_profiler_span_and_timer():
    import time

    from evr_tpu.utils import Timer, span

    Timer.reset()
    with span("unit_test_span"):
        time.sleep(0.01)
    with span("unit_test_span"):
        time.sleep(0.005)
    report = Timer.report()
    assert report["unit_test_span"]["count"] == 2
    assert report["unit_test_span"]["p50_ms"] >= 4.0
    Timer.reset()
    assert Timer.report() == {}
