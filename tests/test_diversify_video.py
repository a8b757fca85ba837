"""MMR result diversification (`query/diversify.py`) and video-level
retrieval (`QueryEngine.query_videos`, `search_method="video"`) — both
beyond-reference capabilities layered on the standard strategy plumbing."""

import numpy as np
import pytest

from evr_tpu.index import FrameIndex
from evr_tpu.query import MetadataStore, QueryEngine, mmr_order, mmr_select
from tests.test_query import FakeEngine, _frame


def _vframe(frameidx, video):
    rec = _frame(frameidx)
    rec["video"] = f"videos/{video}.mp4"
    return rec


def _normed(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


# -- mmr_order unit behavior ----------------------------------------------


def test_mmr_lambda_one_is_relevance_order():
    rel = np.array([0.3, 0.9, 0.5, 0.7], np.float32)
    sim = np.eye(4, dtype=np.float32)
    order = mmr_order(rel, sim, lam=1.0, k=4)
    np.testing.assert_array_equal(order, [1, 3, 2, 0])


def test_mmr_penalises_near_duplicates():
    """Two near-identical top docs: MMR must pick the distinct third doc
    second, even though the duplicate outscores it."""
    rel = np.array([0.90, 0.89, 0.60], np.float32)
    sim = np.array(
        [[1.0, 0.99, 0.1],
         [0.99, 1.0, 0.1],
         [0.1, 0.1, 1.0]],
        np.float32,
    )
    order = mmr_order(rel, sim, lam=0.5, k=3)
    np.testing.assert_array_equal(order, [0, 2, 1])


def test_mmr_first_pick_is_always_most_relevant():
    rng = np.random.default_rng(0)
    rel = rng.random(20).astype(np.float32)
    v = _normed(rng.standard_normal((20, 8)).astype(np.float32))
    order = mmr_order(rel, v @ v.T, lam=0.3, k=5)
    assert order[0] == int(np.argmax(rel))
    assert len(set(order.tolist())) == 5  # no repeats


def test_mmr_validation_and_edges():
    rel = np.array([0.5, 0.4], np.float32)
    sim = np.eye(2, dtype=np.float32)
    assert mmr_order(rel, sim, 0.5, 0).shape == (0,)
    np.testing.assert_array_equal(mmr_order(rel, sim, 0.5, 10), [0, 1])
    with pytest.raises(ValueError, match="lam"):
        mmr_order(rel, sim, 1.5, 2)
    with pytest.raises(ValueError, match="pairwise"):
        mmr_order(rel, np.eye(3, dtype=np.float32), 0.5, 2)
    assert mmr_select([], np.zeros((0, 4)), 0.5, 3) == []


# -- strategy integration --------------------------------------------------


def _corpus_engine(dim=16):
    """3 videos x 6 frames; 'fight' direction dominates vid0 frames 0-3
    (near-duplicates) while vid1 frame 2 and vid2 frame 5 match weaker."""
    fake = FakeEngine(dim)
    fake.register("fight", 1)
    q = fake.direction(1)
    other = np.roll(q, 3)

    idx = FrameIndex(embed_dim=dim, pad_multiple=32)
    store = MetadataStore()
    rng = np.random.default_rng(42)
    for v, vid in enumerate(["vid0", "vid1", "vid2"]):
        emb = _normed(
            0.1 * rng.standard_normal((6, dim)).astype(np.float32) + other
        )
        if vid == "vid0":
            for i in range(4):  # 4 near-duplicate strong matches
                emb[i] = _normed(q + 0.01 * rng.standard_normal(dim).astype(np.float32))
        elif vid == "vid1":
            emb[2] = _normed(q + 0.35 * other)
        else:
            emb[5] = _normed(q + 0.55 * other)
        idx.add_video(vid, emb.astype(np.float32))
        store.add_video(vid, [_vframe(i, vid) for i in range(6)])
    return QueryEngine(fake, idx, store)


def test_query_text_clip_mmr_surfaces_other_videos():
    qe = _corpus_engine()
    plain = qe.query_text_clip("fight", top_k=4)
    plain_videos = {e["videoId"] for e in plain}
    assert plain_videos == {"video-vid0"}
    diverse = qe.query_text_clip("fight", top_k=4, mmr_lambda=0.3)
    diverse_videos = {e["videoId"] for e in diverse}
    assert len(diverse) == 4
    assert len(diverse_videos) >= 2  # duplicates traded for coverage
    # top hit unchanged: MMR's first pick is the most relevant frame
    assert diverse[0]["clip_similarity"] == pytest.approx(
        plain[0]["clip_similarity"], abs=1e-6
    )


def test_query_text_adaptive_mmr_respects_threshold():
    qe = _corpus_engine()
    thr = 0.9
    events = qe.query_text_adaptive("fight", thr, top_k=4, mmr_lambda=0.2)
    assert events  # the strong vid0 matches pass the threshold
    assert all(e["clip_similarity"] >= thr for e in events)


def test_query_videos_ranks_videos_and_shapes_events():
    qe = _corpus_engine()
    events = qe.query_videos("fight", top_k=3)
    assert events[0]["videoId"] == "video-vid0"
    assert len(events) == 3  # one event per video
    assert len({e["videoId"] for e in events}) == 3
    for e in events:
        assert e["video_score"] == e["confidence"]
        assert e["matched_frames"] >= 1
        assert isinstance(e["top_frames"], list) and e["top_frames"]
    # video-level scores are sorted
    scores = [e["video_score"] for e in events]
    assert scores == sorted(scores, reverse=True)
    # vid0's video score averages its top-3 near-duplicate hits (> vid1's)
    assert events[0]["video_score"] > events[1]["video_score"]


def test_query_videos_empty_index():
    qe = QueryEngine(FakeEngine(8), FrameIndex(embed_dim=8), MetadataStore())
    assert qe.query_videos("anything", top_k=3) == []


def test_search_dispatch_includes_video():
    from evr_tpu.query import SEARCH_METHODS

    assert "video" in SEARCH_METHODS
    qe = _corpus_engine()
    events = qe.search("video", query="fight", top_k=2)
    assert len(events) == 2


# -- negative queries ------------------------------------------------------


def test_negative_query_demotes_negative_matches():
    """'fight' NOT 'danger sign': frames aligned with the negative
    direction drop below the composite-scored positive matches."""
    dim = 16
    fake = FakeEngine(dim)
    fake.register("fight", 1)
    fake.register("danger sign", 2)
    qp, qn = fake.direction(1), fake.direction(2)

    idx = FrameIndex(embed_dim=dim, pad_multiple=32)
    store = MetadataStore()
    # frame 0: pure fight; frame 1: fight+danger blend; frame 2: unrelated
    emb = np.stack([
        _normed(qp + 0.05 * np.roll(qp, 4)),
        _normed(0.8 * qp + 0.8 * qn),
        _normed(np.roll(qp, 5)),
    ]).astype(np.float32)
    idx.add_video("vid0", emb)
    store.add_video("vid0", [_vframe(i, "vid0") for i in range(3)])
    qe = QueryEngine(fake, idx, store)

    plain = qe.query_text_clip("fight", top_k=3)
    # without the negative, the blend frame ranks ahead of 'unrelated'
    plain_ids = [e["id"] for e in plain]
    assert plain_ids.index("event-1") < plain_ids.index("event-2")

    neg = qe.query_text_clip(
        "fight", top_k=3, negative_query="danger sign", negative_weight=1.0
    )
    neg_ids = [e["id"] for e in neg]
    assert neg_ids[0] == "event-0"  # pure positive still wins
    # the blend frame is demoted below where it sat without the negative
    assert neg_ids.index("event-1") > plain_ids.index("event-1")


def test_negative_query_weight_zero_keeps_positive_order():
    qe = _corpus_engine()
    plain = qe.query_text_clip("fight", top_k=4)
    w0 = qe.query_text_clip(
        "fight", top_k=4, negative_query="danger sign", negative_weight=0.0
    )
    assert [e["id"] for e in w0] == [e["id"] for e in plain]
