"""Full-stack integration over the reference's REAL fixture data: the four
checked-in per-video embedding matrices (CLIP ViT-B/32 outputs) + metadata
JSONs with genuine EasyOCR (Vietnamese) and YOLO detections.

Exercises exactly what serving does at boot — index build, metadata store,
all 7 strategies, visualization — against production-shaped data."""

import json

import numpy as np
import pytest

from evr_tpu.index import FrameIndex
from evr_tpu.query import MetadataStore, QueryEngine, fold_accents

VIDEOS = ["Violence_2", "Violence", "video_test_3", "video_test_4"]


class RowQueryEngine:
    """'Text encoder' that returns a designated index row — lets the text
    strategies run against real embeddings without OpenAI weights."""

    def __init__(self):
        self.vec = None

    def get_text_features(self, query):
        return self.vec


@pytest.fixture(scope="module")
def stack(reference_fixtures):
    index = FrameIndex(embed_dim=512, pad_multiple=256)
    store = MetadataStore()
    raw = {}
    for name in VIDEOS:
        emb = np.load(reference_fixtures / "embedding" / f"{name}_embeddings.npy")
        records = json.loads(
            (reference_fixtures / "metadata" / f"{name}_metadata.json").read_text(
                encoding="utf-8"
            )
        )
        assert len(emb) == len(records)  # fixture alignment invariant
        frame_names = [r["frameid"] for r in records]
        index.add_video(name, emb.astype(np.float32), frame_names)
        store.add_video(name, records, fps=25.0)
        raw[name] = (emb, records)
    fake = RowQueryEngine()
    return QueryEngine(fake, index, store), fake, raw


def test_index_scale_and_selfmatch(stack):
    qe, fake, raw = stack
    assert qe.index.total_frames == 50 + 49 + 360 + 387
    emb, records = raw["video_test_3"]
    fake.vec = emb[100]
    results = qe.query_text_clip("q", top_k=5)
    assert results, "no results over reference fixtures"
    top = results[0]
    assert top["id"] == f"event-{records[100]['frameidx']}"
    assert top["clip_similarity"] > 0.999


def test_video_scoped_search(stack):
    qe, fake, raw = stack
    emb, _ = raw["Violence"]
    fake.vec = emb[10]
    results = qe.query_text_adaptive("q", 0.2, top_k=10, video_name="Violence_2")
    # scoped to another video: the self-match row is out of scope
    ids = {r["videoId"] for r in results}
    assert ids <= {"video-Violence_2"} or not results


def test_object_strategy_real_yolo(stack):
    qe, _, _ = stack
    results = qe.query_object("person", adaptive_threshold=0.5, top_k=20)
    assert len(results) == 20  # plenty of person detections in fixtures
    assert all(r["confidence"] > 0 for r in results)
    # descending confidence
    confs = [r["confidence"] for r in results]
    assert confs == sorted(confs, reverse=True)


def test_keyword_strategy_real_ocr_accent_folding(stack):
    qe, _, raw = stack
    # pick a real Vietnamese OCR phrase from the fixtures and query it
    # WITHOUT accents to exercise folding on production text
    results = qe.query_keyword("hotline", adaptive_threshold=0.3, top_k=10)
    assert results
    # an accented query term from the fixture OCR
    accented = qe.query_keyword("người", adaptive_threshold=0.1, top_k=10)
    unaccented = qe.query_keyword("nguoi", adaptive_threshold=0.1, top_k=10)
    assert {r["id"] for r in accented} <= {r["id"] for r in unaccented} or (
        accented == [] and unaccented == []
    )


def test_combined_strategy_over_fixtures(stack):
    qe, fake, raw = stack
    emb, records = raw["Violence_2"]
    # find a frame with a person detection, query with its own embedding
    person_rows = [
        i
        for i, r in enumerate(records)
        if any(
            d["label"] == "person"
            for d in r.get("object_detections", {}).get("detections", [])
        )
    ]
    assert person_rows
    fake.vec = emb[person_rows[0]]
    results = qe.query_text_object(
        "q", adaptive_threshold=0.5, top_k=5, object_keyword="person",
        object_confidence=0.3,
    )
    assert results
    assert results[0]["detection_type"] == "object+clip"
    assert results[0]["confidence"] >= 0.5


def test_fixture_data_facts(stack):
    """Pin stable facts about the fixture corpus so semantic drift in the
    match sources is caught (counts computed directly from the data)."""
    qe, _, raw = stack
    _, records = raw["Violence_2"]

    # ground truth reimplemented from the raw data with the strategy's
    # documented semantics: requested threshold 0.8 is CAPPED at 0.65
    # (`query_strategies.py:443`); sources = object detections (native
    # conf), caption 0.65, tags 0.75, OCR text ×0.7.
    def frame_matches(r):
        if any(
            "person" in d["label"].lower() and d["confidence"] >= 0.65
            for d in r.get("object_detections", {}).get("detections", [])
        ):
            return True
        if "person" in str((r.get("metadata") or {}).get("caption", "")).lower():
            return True  # caption source scores exactly 0.65 == cap
        if any("person" in str(t).lower() for t in r.get("tags", [])):
            return True  # tag source 0.75 >= 0.65
        return any(
            "person" in d["label"].lower() and d["confidence"] * 0.7 >= 0.65
            for d in r.get("text_detections", {}).get("detections", [])
        )

    expected = sum(1 for r in records if frame_matches(r))
    results = qe.query_object(
        "person", adaptive_threshold=0.8, top_k=1000, video_name="Violence_2"
    )
    assert len(results) == expected
    assert expected > 0


def test_reference_registry_windows_paths(reference_fixtures, tmp_path):
    """The reference's real video_mapping.json (absolute Windows paths)
    loads and self-heals without crashing on POSIX."""
    import shutil

    from evr_tpu.index import VideoRegistry

    mapping = tmp_path / "video_mapping.json"
    shutil.copy(reference_fixtures / "metadata" / "video_mapping.json", mapping)
    reg = VideoRegistry(mapping)
    names = reg.names()
    assert len(names) >= 4
    dropped = reg.prune_missing()
    # every Windows-absolute video path is unreachable here → all pruned
    assert set(dropped) == set(names)
    assert reg.names() == []


def test_visualization_over_fixtures(stack):
    from evr_tpu.viz import generate_visualization

    qe, _, _ = stack
    viz = generate_visualization(
        qe.index, qe.metadata, ["Violence_2", "Violence"], method="pca"
    )
    assert len(viz["coordinates"]) == 99
    assert set(viz["videos"]) == {"Violence_2", "Violence"}
    assert any("object" in m for m in viz["metadata"])
