"""Frontend contract lock (VERDICT r1 #8).

`tests/golden/frontend_contract.json` records every request/response field
the reference React frontend sends or reads (extracted from
`/root/reference/Frontend/src`, citations inline in the fixture). These
tests replay each endpoint through the WSGI client and fail whenever a
field the frontend reads is renamed or dropped — the render-test we cannot
run here (no node/npm), reduced to its data dependency."""

import io
import json
import pathlib

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
werkzeug = pytest.importorskip("werkzeug")

from werkzeug.test import Client

from evr_tpu.config import DataRootConfig
from evr_tpu.index import EmbeddingEngine
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
from evr_tpu.serving import ServingContext, create_app

CONTRACT = json.loads(
    (pathlib.Path(__file__).parent / "golden" / "frontend_contract.json").read_text()
)["endpoints"]


def _make_video(path, n=60):
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 64))
    for i in range(n):
        frame = np.zeros((64, 64, 3), np.uint8)
        if i < n // 2:
            frame[:, :, 0] = 180
        else:
            frame[:, :, 2] = 220
        writer.write(frame)
    writer.release()


@pytest.fixture(scope="module")
def client(tmp_path_factory):
    root = tmp_path_factory.mktemp("contract")
    video_path = root / "clip1.mp4"
    _make_video(video_path)
    small = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    engine = EmbeddingEngine(cfg=small, batch_size=4)
    ctx = ServingContext(DataRootConfig(root / "data"), engine=engine)
    ctx.ingest(video_path)
    app = create_app(ctx)
    return Client(app)


def get_json(resp):
    return json.loads(resp.get_data(as_text=True))


def _assert_fields(obj, fields, where):
    missing = [f for f in fields if f not in obj]
    assert not missing, f"{where}: frontend-read fields missing: {missing}"


def test_videos_listing_fields(client):
    spec = CONTRACT["GET /api/videos"]
    videos = get_json(client.get("/api/videos"))
    assert isinstance(videos, list) and videos
    for v in videos:
        _assert_fields(v, spec["item_fields"], "GET /api/videos item")


def test_video_events_fields(client):
    spec = CONTRACT["GET /api/video/<id>/events"]
    events = get_json(client.get("/api/video/video-1/events"))
    assert isinstance(events, list) and events
    for e in events:
        _assert_fields(e, spec["item_fields"], "video events item")


def test_search_accepts_all_frontend_params_and_returns_all_fields(client):
    spec = CONTRACT["POST /api/search"]
    # the exact superset of params AdvancedSearchPanel sends for the
    # combined text_object_keyword method (plus VideoContext's
    # min_confidence) — the backend must accept every one without error
    payload = {
        "search_type": "text",
        "query": "red frame",
        "min_confidence": 0.0,
        "top_k": 5,
        "model": "original",
        "videoId": "video-1",
        "adaptive_threshold": 0.0,
        "text_confidence": 0.0,
        "object_confidence": 0.0,
        "return_all_confidences": True,
        "search_method": "text_clip",
        "keyword": "",
        "object": "",
    }
    sent = set(payload) | {"image_url"}
    assert sent == set(spec["request_params_sent"]["params"]), (
        "fixture drifted from test payload"
    )
    resp = client.post("/api/search", json=payload)
    assert resp.status_code == 200
    data = get_json(resp)
    _assert_fields(data, spec["fields"], "POST /api/search response")
    assert data["events"], "search returned no events to validate fields on"
    for e in data["events"]:
        _assert_fields(e, spec["event_fields"], "search event")


def test_upload_video_fields(client, tmp_path):
    # sync=1 preserves the exact legacy single-request contract the React
    # VideoContext reads (status=='success' && video{...}); the async
    # default delivers the same shape in the terminal job status.
    spec = CONTRACT["POST /api/upload-video"]
    vid = tmp_path / "upload_me.mp4"
    _make_video(vid, n=40)
    resp = client.post(
        "/api/upload-video",
        data={"video": (io.BytesIO(vid.read_bytes()), "upload_me.mp4"),
              "sync": "1"},
    )
    assert resp.status_code == 200
    data = get_json(resp)
    _assert_fields(data, spec["fields"], "upload response")
    assert data["status"] == "success"
    _assert_fields(data["video"], spec["video_fields"], "upload response .video")


def test_upload_video_async_fields(client, tmp_path):
    spec = CONTRACT["POST /api/upload-video (async)"]
    legacy = CONTRACT["POST /api/upload-video"]
    vid = tmp_path / "upload_async.mp4"
    _make_video(vid, n=40)
    resp = client.post(
        "/api/upload-video",
        data={"video": (io.BytesIO(vid.read_bytes()), "upload_async.mp4")},
    )
    assert resp.status_code == 202
    data = get_json(resp)
    _assert_fields(data, spec["fields"], "async upload response")
    job = client.application.ctx.ingest_jobs.wait(data["job_id"], timeout=120)
    assert job.state == "done", job.error
    status = get_json(client.get(data["status_url"]))
    _assert_fields(
        status, CONTRACT["GET /api/upload-status/<id>"]["fields"], "upload status"
    )
    # terminal status carries the full legacy payload
    _assert_fields(status, legacy["fields"], "terminal upload status")
    _assert_fields(status["video"], legacy["video_fields"], "terminal status .video")


def test_models_fields(client):
    models = get_json(client.get("/api/models"))
    assert isinstance(models, list) and models
    for m in models:
        _assert_fields(m, CONTRACT["GET /api/models"]["item_fields"], "models item")
    active = get_json(client.get("/api/models/active"))
    _assert_fields(active, CONTRACT["GET /api/models/active"]["fields"], "models/active")
    # request param the panel posts
    resp = client.post("/api/models/active", json={"model": "original"})
    assert resp.status_code == 200


def test_transcribe_fields(client):
    from evr_tpu.serving.providers import CallableTranscriber

    ctx = client.application.ctx
    old = ctx.transcriber
    ctx.transcriber = CallableTranscriber(lambda path, lang: "heard")
    try:
        resp = client.post(
            "/api/transcribe-voice",
            data={"audio": (io.BytesIO(b"RIFFxxxx"), "voice.wav")},
        )
        assert resp.status_code == 200
        _assert_fields(
            get_json(resp), CONTRACT["POST /api/transcribe-voice"]["fields"],
            "transcribe response",
        )
    finally:
        ctx.transcriber = old
    # error shape the panel reads on failure
    resp = client.post("/api/transcribe-voice", data={})
    assert resp.status_code >= 400
    _assert_fields(
        get_json(resp), CONTRACT["POST /api/transcribe-voice"]["error_fields"],
        "transcribe error",
    )


def test_available_videos_fields(client):
    spec = CONTRACT["GET /api/videos/available"]
    data = get_json(client.get("/api/videos/available"))
    _assert_fields(data, spec["fields"], "videos/available")
    for v in data["available_videos"]:
        _assert_fields(v, spec["item_fields"], "available video item")


def test_umap_fields(client):
    spec = CONTRACT["POST /api/visualization/umap"]
    # the exact request the VisualizationPanel sends
    resp = client.post(
        "/api/visualization/umap",
        json={"video_names": None, "n_neighbors": 15, "min_dist": 0.1,
              "metric": "cosine"},
    )
    assert resp.status_code == 200
    viz = get_json(resp)
    _assert_fields(viz, spec["fields"], "umap response")
    assert len(viz["coordinates"]) == len(viz["video_labels"]) == len(viz["metadata"])
    assert viz["metadata"], "umap returned no points"
    for point_meta in viz["metadata"]:
        _assert_fields(point_meta, spec["metadata_fields"], "umap metadata point")
    for coord in viz["coordinates"]:
        assert len(coord) == 2


def test_binary_endpoints(client):
    assert client.get("/api/frame/15.jpg").status_code == 200
    assert client.get("/api/video/clip1.mp4").status_code == 200
