"""Query layer: the 7 strategies' threshold/fusion/sort semantics, accent
folding, metadata store lookups, event formatting."""

import numpy as np
import pytest

from evr_tpu.index import FrameIndex
from evr_tpu.query import (
    MetadataStore,
    QueryEngine,
    SEARCH_METHODS,
    fold_accents,
    format_event_for_frontend,
)


class FakeEngine:
    """Deterministic 'text encoder': maps known queries to fixed directions."""

    def __init__(self, dim=8):
        self.dim = dim
        self.vecs = {}

    def direction(self, i):
        v = np.zeros(self.dim, np.float32)
        v[i % self.dim] = 1.0
        return v

    def register(self, query, i):
        self.vecs[query] = self.direction(i)

    def get_text_features(self, query):
        return self.vecs.get(query, self.direction(0))


def _frame(frameidx, text=None, objects=None, tags=None, caption=None):
    rec = {
        "frameidx": frameidx,
        "frameid": f"{frameidx}.jpg",
        "video": "videos/testvid.mp4",
        "filepath": f"frames/{frameidx}.jpg",
        "tags": tags or [],
        "metadata": {"caption": caption} if caption else {},
        "text_detections": {
            "detections": [
                {"label": lbl, "confidence": c, "bounding_box": [0, 0, 1, 1]}
                for lbl, c in (text or [])
            ]
        },
        "object_detections": {
            "detections": [
                {"label": lbl, "confidence": c, "bounding_box": [0, 0, 1, 1]}
                for lbl, c in (objects or [])
            ]
        },
    }
    return rec


@pytest.fixture()
def setup():
    dim = 8
    fake = FakeEngine(dim)
    fake.register("fight", 1)
    fake.register("danger sign", 2)

    # three frames; frame 10 aligned with "fight", 20 with "danger sign"
    emb = np.zeros((3, dim), np.float32)
    emb[0, 1] = 1.0  # frame 10
    emb[1, 2] = 1.0  # frame 20
    emb[2, 3] = 1.0  # frame 30
    idx = FrameIndex(embed_dim=dim, pad_multiple=8)
    idx.add_video("testvid", emb, ["10.jpg", "20.jpg", "30.jpg"])

    store = MetadataStore()
    store.add_video(
        "testvid",
        [
            _frame(
                10,
                text=[("danger ahead", 0.9)],
                objects=[("person", 0.8), ("knife", 0.6)],
            ),
            _frame(20, text=[("lối thoát", 0.85)], tags=["weapon"]),
            _frame(30, caption="a crowd fighting with sticks"),
        ],
        fps=25.0,
    )
    qe = QueryEngine(fake, idx, store)
    return qe


def test_text_clip_orders_by_similarity(setup):
    results = setup.query_text_clip("fight", top_k=3)
    assert results[0]["id"] == "event-10"
    assert results[0]["clip_similarity"] == pytest.approx(1.0)
    assert len(results) == 3


def test_text_adaptive_threshold_filters(setup):
    results = setup.query_text_adaptive("fight", adaptive_threshold=0.5, top_k=5)
    assert [r["id"] for r in results] == ["event-10"]
    assert setup.query_text_adaptive("fight", adaptive_threshold=1.1, top_k=5) == []


def test_keyword_accent_insensitive(setup):
    # "loi thoat" (no accents) must match OCR "lối thoát"
    results = setup.query_keyword("loi thoat", adaptive_threshold=0.5, top_k=5)
    assert [r["id"] for r in results] == ["event-20"]
    assert results[0]["text_confidence"] == pytest.approx(0.85)
    # above the detection's confidence → filtered
    assert setup.query_keyword("loi thoat", adaptive_threshold=0.9, top_k=5) == []


def test_text_keyword_requires_both(setup):
    results = setup.query_text_keyword(
        "fight", adaptive_threshold=0.5, top_k=5, keyword="danger", text_confidence=0.5
    )
    assert [r["id"] for r in results] == ["event-10"]
    ev = results[0]
    assert ev["detection_type"] == "text+clip"
    assert ev["confidence"] == pytest.approx(max(1.0, 0.9))
    # keyword matches frame 10 but clip candidate threshold excludes it
    assert (
        setup.query_text_keyword(
            "danger sign", adaptive_threshold=0.5, top_k=5, keyword="danger"
        )
        == []
    )


def test_object_sources_and_cap(setup):
    # direct object detection
    r = setup.query_object("person", adaptive_threshold=0.7, top_k=5)
    assert [x["id"] for x in r] == ["event-10"]
    assert r[0]["object_confidence"] == pytest.approx(0.8)
    # tag source: match conf 0.75 admits the frame, but the formatted event
    # recomputes confidences from detections (reference format_event ignores
    # the injected object_confidence — data_service.py:147-251)
    r = setup.query_object("weapon", adaptive_threshold=0.7, top_k=5)
    assert [x["id"] for x in r] == ["event-20"]
    assert r[0]["object_confidence"] == pytest.approx(0.0)
    assert r[0]["confidence"] == pytest.approx(0.85)  # its OCR detection
    # caption source: match conf 0.65 — the threshold cap at 0.65 admits it
    # even though the requested threshold is 0.9
    r = setup.query_object("sticks", adaptive_threshold=0.9, top_k=5)
    assert [x["id"] for x in r] == ["event-30"]
    # OCR fallback source at 0.7x admits frame 10 (0.9*0.7 >= 0.6)
    r = setup.query_object("ahead", adaptive_threshold=0.6, top_k=5)
    assert [x["id"] for x in r] == ["event-10"]
    assert (
        setup.query_object("ahead", adaptive_threshold=0.64, top_k=5) == []
    )  # 0.63 < 0.64


def test_text_object_excludes_ocr_source(setup):
    # 'ahead' exists only in OCR text of frame 10; text_object must NOT match
    assert (
        setup.query_text_object(
            "fight", adaptive_threshold=0.5, top_k=5, object_keyword="ahead",
            object_confidence=0.1,
        )
        == []
    )
    r = setup.query_text_object(
        "fight", adaptive_threshold=0.5, top_k=5, object_keyword="person",
        object_confidence=0.5,
    )
    assert [x["id"] for x in r] == ["event-10"]
    assert r[0]["detection_type"] == "object+clip"


def test_triple_strategy(setup):
    r = setup.query_text_object_keyword(
        "fight",
        adaptive_threshold=0.5,
        top_k=5,
        keyword="danger",
        text_confidence=0.5,
        object_keyword="knife",
        object_confidence=0.5,
    )
    assert [x["id"] for x in r] == ["event-10"]
    ev = r[0]
    assert ev["detection_type"] == "text+object+clip"
    assert ev["confidence"] == pytest.approx(1.0)
    assert ev["object_confidence"] == pytest.approx(0.6)
    assert ev["text_confidence"] == pytest.approx(0.9)


def test_dispatch_table(setup):
    assert set(SEARCH_METHODS) == {
        # the reference's 7 strategies
        "text_clip",
        "text_adaptive",
        "keyword_only",
        "text_keyword",
        "object_only",
        "text_object",
        "text_object_keyword",
        # beyond-reference: searchable ASR transcripts
        "speech_only",
        "text_speech",
        # beyond-reference: video-level ranking
        "video",
    }
    r = setup.search("text_clip", query="fight", top_k=1)
    assert len(r) == 1
    with pytest.raises(ValueError):
        setup.search("nope", query="x", top_k=1)


def test_vietnamese_preprocessor_language_gate():
    from evr_tpu.query import VietnamesePreprocessor

    calls = []

    def translator(text):
        calls.append(text)
        return "translated"

    p = VietnamesePreprocessor(translator=translator)
    # plain English skips translation
    assert p("a man fighting") == "a man fighting"
    assert calls == []
    # Vietnamese diacritics trigger it (cached thereafter)
    assert p("bạo lực trên đường") == "translated"
    assert len(calls) == 1
    assert p("bạo lực trên đường") == "translated"
    assert len(calls) == 1


def test_fold_accents_vietnamese():
    assert fold_accents("bạo lực trên đường phố") == "bao luc tren duong pho"
    assert fold_accents("Đặc biệt") == "Dac biet"


def test_event_format_fusion():
    frame = _frame(50, text=[("warning", 0.6)], objects=[("gun", 0.9)])
    frame["clip_similarity"] = 0.95
    ev = format_event_for_frontend(frame, fps=10.0)
    # object beats text, clip beats object
    assert ev["detection_type"] == "clip"
    assert ev["confidence"] == pytest.approx(0.95)
    assert ev["timestamp"] == pytest.approx(5.0)
    assert ev["videoId"] == "video-testvid"


def test_reference_metadata_fixture(reference_fixtures):
    """The real checked-in metadata parses into the store and keyword search
    over its OCR detections returns plausible frames."""
    import json

    path = reference_fixtures / "metadata" / "Violence_2_metadata.json"
    records = json.loads(path.read_text(encoding="utf-8"))
    store = MetadataStore()
    store.add_video("Violence_2", records)
    assert len(store.frames("Violence_2")) == len(records)
    fr = store.frames("Violence_2")[0]
    assert fr.frameid.endswith(".jpg")


# -- temporal chain search ---------------------------------------------------


def test_chain_dp_ordering_and_gap():
    from evr_tpu.query.temporal import chain_dp

    # K=2 over 5 frames: best unordered pair would be (3, 1) but ordering
    # forces f1 < f2
    s = np.array(
        [
            [0.1, 0.2, 0.1, 0.9, 0.1],  # step 1 peaks at frame 3
            [0.1, 0.8, 0.1, 0.1, 0.5],  # step 2 peaks at frame 1 (before!)
        ],
        np.float32,
    )
    total, chain = chain_dp(s)
    assert chain == [3, 4]  # step1@3 then step2@4 (0.9+0.5), not 3→1
    assert total == pytest.approx(1.4)

    # gap constraint: with max_gap=1 the chain 0→4 is illegal
    s2 = np.array(
        [[0.9, 0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0, 0.9]], np.float32
    )
    total_u, chain_u = chain_dp(s2)
    assert chain_u == [0, 4]
    total_g, chain_g = chain_dp(s2, max_gap=1)
    assert chain_g != [0, 4]

    # infeasible: more steps than frames
    total_i, chain_i = chain_dp(np.zeros((3, 2), np.float32))
    assert chain_i == [] and total_i == float("-inf")


def test_query_temporal_chains(setup):
    fake = setup.engine
    fake.encode_texts = lambda qs: np.stack(
        [fake.get_text_features(q) for q in qs]
    )
    results = setup.query_temporal(["fight", "danger sign"], top_k=3)
    assert results, "expected at least one chain"
    best = results[0]
    # frame 10 (fight) precedes frame 20 (danger sign) in testvid
    assert [s["id"] for s in best["chain"]] == ["event-10", "event-20"]
    assert best["total_score"] == pytest.approx(2.0)
    assert best["id"] == "event-10"  # representative = first step

    # reversed order scores strictly lower (DP enforces f1 < f2)
    rev = setup.query_temporal(["danger sign", "fight"], top_k=3)
    assert rev[0]["total_score"] < best["total_score"]


def test_query_temporal_needs_two(setup):
    with pytest.raises(ValueError):
        setup.query_temporal(["only one"])
