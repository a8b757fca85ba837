"""HTTP serving over the reference's REAL fixture corpus: 846 frames of
genuine CLIP embeddings + EasyOCR/YOLO metadata, queried through the API."""

import json

import numpy as np
import pytest

werkzeug = pytest.importorskip("werkzeug")

from werkzeug.test import Client

from evr_tpu.config import DataRootConfig
from evr_tpu.index import EmbeddingEngine
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
from evr_tpu.serving import ServingContext, create_app

VIDEOS = ["Violence_2", "Violence", "video_test_3", "video_test_4"]


@pytest.fixture(scope="module")
def client(reference_fixtures, tmp_path_factory):
    root = tmp_path_factory.mktemp("refserve")
    small = CLIPConfig(
        embed_dim=512,  # matches the fixture embedding width
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    # tiny text tower projecting into the fixtures' 512-d space
    engine = EmbeddingEngine(cfg=small, batch_size=4)
    ctx = ServingContext(DataRootConfig(root / "data"), engine=engine)
    for name in VIDEOS:
        emb = np.load(reference_fixtures / "embedding" / f"{name}_embeddings.npy")
        records = json.loads(
            (reference_fixtures / "metadata" / f"{name}_metadata.json").read_text(
                encoding="utf-8"
            )
        )
        ctx.index_for("original").add_video(
            name, emb.astype(np.float32), [r["frameid"] for r in records]
        )
        ctx.metadata.add_video(name, records, fps=25.0)
        # registry entry so videoId mapping works (video files absent on disk)
        ctx.registry.add(
            name,
            metadata_file=str(reference_fixtures / "metadata" / f"{name}_metadata.json"),
            embeddings_file=str(reference_fixtures / "embedding" / f"{name}_embeddings.npy"),
            video_path=f"{name}.mp4",
            frames_dir=f"frames/{name}",
        )
    return Client(create_app(ctx))


def get_json(resp):
    return json.loads(resp.get_data(as_text=True))


def test_object_search_over_real_yolo(client):
    resp = client.post(
        "/api/search",
        json={
            "search_type": "text",
            "query": "person",
            "search_method": "object_only",
            "object_confidence": 0.5,
            "top_k": 15,
        },
    )
    events = get_json(resp)["events"]
    assert len(events) == 15
    assert all(e["confidence"] > 0 for e in events)


def test_keyword_search_over_real_ocr(client):
    resp = client.post(
        "/api/search",
        json={
            "search_type": "text",
            "query": "hotline",
            "search_method": "keyword_only",
            "text_confidence": 0.3,
            "top_k": 10,
        },
    )
    events = get_json(resp)["events"]
    assert events
    assert all(e["text_confidence"] >= 0.3 for e in events)


def test_semantic_search_returns_real_frames(client):
    resp = client.post(
        "/api/search",
        json={"search_type": "text", "query": "violence on camera",
              "search_method": "text_clip", "top_k": 8},
    )
    events = get_json(resp)["events"]
    assert len(events) == 8
    ids = {e["videoId"] for e in events}
    assert ids <= {f"video-{n}" for n in VIDEOS}


def test_video_scoped_events_route(client):
    events = get_json(client.get("/api/video/video-1/events"))
    assert len(events) == 20  # 50-frame Violence_2 subsampled to 20 markers
    assert all(e["id"].startswith("event-") for e in events)


def test_umap_over_real_embeddings(client):
    resp = client.post(
        "/api/visualization/umap",
        json={"method": "pca", "video_names": ["Violence_2"]},
    )
    viz = get_json(resp)
    assert len(viz["coordinates"]) == 50
    assert any("object" in m or "text" in m for m in viz["metadata"])
