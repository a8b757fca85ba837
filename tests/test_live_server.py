"""System test: a REAL threaded HTTP server under concurrent search +
upload load (the race profile the reference runs blind —
SURVEY.md §5.2)."""

import io
import json
import socket
import threading
import time
import urllib.request

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
werkzeug = pytest.importorskip("werkzeug")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_video(path, n=40):
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 64))
    for i in range(n):
        f = np.zeros((64, 64, 3), np.uint8)
        f[:, :, 0 if i < n // 2 else 2] = 200
        w.write(f)
    w.release()


@pytest.fixture(scope="module")
def live_server(tmp_path_factory):
    from werkzeug.serving import make_server

    from evr_tpu.config import DataRootConfig
    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
    from evr_tpu.serving import ServingContext, create_app

    root = tmp_path_factory.mktemp("live")
    video = root / "seed.mp4"
    _make_video(video)
    small = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    ctx = ServingContext(DataRootConfig(root / "data"), engine=EmbeddingEngine(cfg=small, batch_size=4))
    ctx.ingest(video)

    port = _free_port()
    server = make_server("127.0.0.1", port, create_app(ctx), threaded=True)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", root
    server.shutdown()


def _post_json(url, payload, timeout=30):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


def test_concurrent_search_during_upload(live_server, tmp_path):
    base, root = live_server
    errors = []
    statuses = []
    stop = threading.Event()

    def search_worker(i):
        try:
            while not stop.is_set():
                status, body = _post_json(
                    f"{base}/api/search",
                    {
                        "search_type": "text",
                        "query": f"scene {i}",
                        "search_method": "text_clip",
                        "top_k": 3,
                    },
                )
                statuses.append(status)
                assert status == 200 and "events" in body
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def upload_worker():
        try:
            video2 = tmp_path / "up.mp4"
            _make_video(video2, n=30)
            boundary = "----evrboundary"
            payload = (
                f"--{boundary}\r\n"
                'Content-Disposition: form-data; name="video"; filename="up.mp4"\r\n'
                "Content-Type: video/mp4\r\n\r\n"
            ).encode() + video2.read_bytes() + f"\r\n--{boundary}--\r\n".encode()
            req = urllib.request.Request(
                f"{base}/api/upload-video",
                data=payload,
                headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
            )
            with urllib.request.urlopen(req, timeout=120) as resp:
                # async-by-default upload: 202 + job id, then poll the
                # status route until the ingest completes (searches keep
                # running concurrently the whole time — the point of this test)
                assert resp.status == 202
                body = json.loads(resp.read())
                assert body["status"] == "processing"
            deadline = time.time() + 150
            while time.time() < deadline:
                with urllib.request.urlopen(
                    f"{base}{body['status_url']}", timeout=30
                ) as sresp:
                    st = json.loads(sresp.read())
                if st["state"] in ("done", "error"):
                    break
                time.sleep(0.3)
            assert st["state"] == "done", st
            assert st["status"] == "success"
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            time.sleep(0.3)
            stop.set()

    searchers = [threading.Thread(target=search_worker, args=(i,)) for i in range(3)]
    up = threading.Thread(target=upload_worker)
    for t in searchers:
        t.start()
    up.start()
    up.join(timeout=180)
    stop.set()
    for t in searchers:
        t.join(timeout=60)

    assert not errors, errors
    assert len(statuses) >= 3 and all(s == 200 for s in statuses)

    # both videos now served
    with urllib.request.urlopen(f"{base}/api/videos", timeout=30) as resp:
        videos = json.loads(resp.read())
    assert {v["title"] for v in videos} == {"seed", "up"}
