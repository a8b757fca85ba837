"""Fused one-dispatch text search must rank identically to the two-step
path (encode_texts → index.search_raw)."""

import numpy as np

from evr_tpu.index import EmbeddingEngine, FrameIndex
from evr_tpu.index.fused_search import TextSearcher
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig


def _setup(rng):
    small = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    engine = EmbeddingEngine(cfg=small, batch_size=4)
    index = FrameIndex(embed_dim=32, pad_multiple=64)
    index.add_video("a", rng.normal(size=(40, 32)).astype(np.float32))
    index.add_video("b", rng.normal(size=(25, 32)).astype(np.float32))
    return engine, index


def test_fused_matches_two_step(rng):
    engine, index = _setup(rng)
    searcher = TextSearcher(engine, index)
    queries = ["a person fighting", "an empty street"]

    vecs = engine.encode_texts(queries)
    ref_scores, ref_rows = index.search_raw(vecs, 7)
    scores, rows = searcher.search(queries, 7)
    np.testing.assert_array_equal(rows, ref_rows)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-5, atol=1e-6)


def test_fused_video_scope_and_cache(rng):
    engine, index = _setup(rng)
    searcher = TextSearcher(engine, index)
    scores, rows = searcher.search("query", 5, video_name="b")
    start, end = index._range_for("b")
    assert ((rows >= start) & (rows < end)).all()
    # cached second call returns the identical arrays
    scores2, rows2 = searcher.search("query", 5, video_name="b")
    assert scores2 is scores and rows2 is rows
    searcher.invalidate()
    scores3, _ = searcher.search("query", 5, video_name="b")
    assert scores3 is not scores
