"""Edge cases across the stack: empty index, metadata-less videos, empty
folders, zero-result strategies, degenerate inputs."""

import numpy as np
import pytest

from evr_tpu.index import FrameIndex
from evr_tpu.query import MetadataStore, QueryEngine


class ZeroEngine:
    def get_text_features(self, query):
        return np.ones(16, np.float32)


def test_empty_index_search():
    idx = FrameIndex(embed_dim=16, pad_multiple=64)
    hits = idx.search(np.ones(16, np.float32), top_k=5)
    assert hits == [[]]
    scores, rows = idx.search_raw(np.ones((2, 16), np.float32), 5)
    assert scores.shape[0] == 2
    assert not np.isfinite(scores).any()


def test_query_engine_without_metadata():
    """Frames in the index but no metadata records: strategies degrade to
    empty results rather than crashing."""
    idx = FrameIndex(embed_dim=16, pad_multiple=64)
    idx.add_video("bare", np.ones((4, 16), np.float32))
    qe = QueryEngine(ZeroEngine(), idx, MetadataStore())
    assert qe.query_text_clip("x", top_k=3) == []
    assert qe.query_keyword("x", 0.1, top_k=3) == []
    assert qe.query_object("x", 0.1, top_k=3) == []


def test_metadata_frame_without_detections():
    store = MetadataStore()
    store.add_video("v", [{"frameidx": 1, "frameid": "1.jpg"}])
    fr = store.frame_by_idx("v", 1)
    assert store.keyword_best_match(fr, "anything") == 0.0
    found, conf, _ = store.object_best_match(fr, "anything")
    assert not found and conf == 0.0


def test_single_frame_video_topk():
    idx = FrameIndex(embed_dim=16, pad_multiple=64)
    idx.add_video("one", np.ones((1, 16), np.float32))
    hits = idx.search(np.ones(16, np.float32), top_k=10)[0]
    assert len(hits) == 1
    assert hits[0].score == pytest.approx(1.0)


def test_zero_vector_query():
    """A zero query vector must not produce NaNs (norm guard)."""
    idx = FrameIndex(embed_dim=16, pad_multiple=64)
    idx.add_video("v", np.random.default_rng(0).normal(size=(5, 16)).astype(np.float32))
    scores, rows = idx.search_raw(np.zeros(16, np.float32), 3)
    assert rows.shape == (1, 3)
    assert np.isfinite(scores).all()  # zero-norm guard: no NaNs
    assert (rows >= 0).all() and (rows < 5).all()


def test_engine_empty_text_batch():
    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig

    small = CLIPConfig(
        embed_dim=16,
        vision=VisionConfig(32, 8, 32, 1, 2),
        text=TextConfig(16, 600, 32, 1, 2),
    )
    engine = EmbeddingEngine(cfg=small, batch_size=4)
    out = engine.encode_staged_images(np.zeros((0, 32, 32, 3), np.uint8))
    assert out.shape == (0, 16)
