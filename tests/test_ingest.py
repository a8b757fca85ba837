"""Ingestion: scene detection on a synthetic two-scene video, frame
extraction contract, metadata schema, end-to-end pipeline."""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from evr_tpu.config import DataRootConfig
from evr_tpu.ingest import (
    ContentDetectorConfig,
    build_frame_record,
    detect_scenes,
    extract_scene_frames,
    extract_uniform_frames,
    ingest_video,
)


@pytest.fixture(scope="module")
def synthetic_video(tmp_path_factory):
    """60-frame 64x64 video: frames 0-29 dark blue, 30-59 bright red —
    one hard cut at frame 30."""
    path = tmp_path_factory.mktemp("vid") / "twoscene.mp4"
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 64)
    )
    for i in range(60):
        frame = np.zeros((64, 64, 3), np.uint8)
        if i < 30:
            frame[:, :, 0] = 180  # blue-ish
        else:
            frame[:, :, 2] = 220  # red
        writer.write(frame)
    writer.release()
    return path


def test_detect_scenes_finds_cut(synthetic_video):
    scenes = detect_scenes(synthetic_video, ContentDetectorConfig(threshold=30.0))
    assert len(scenes) == 2
    (s0, e0), (s1, e1) = scenes
    assert s0 == 0 and e0 == 30 and s1 == 30 and e1 == 60


def test_high_threshold_single_scene(synthetic_video):
    scenes = detect_scenes(synthetic_video, ContentDetectorConfig(threshold=250.0))
    assert scenes == [(0, 60)]


def test_extract_scene_frames_middle(synthetic_video, tmp_path):
    saved = extract_scene_frames(synthetic_video, tmp_path / "frames", threshold=30.0)
    assert saved == [15, 45]  # middle of each scene
    names = sorted(p.name for p in (tmp_path / "frames").iterdir())
    assert names == ["15.jpg", "45.jpg"]


def test_extract_uniform_frames(synthetic_video, tmp_path):
    saved = extract_uniform_frames(synthetic_video, tmp_path / "u", frames_per_video=5)
    assert len(saved) == 5
    assert saved[0] == 0 and saved[-1] == 59


def test_frame_record_schema(synthetic_video, tmp_path):
    from PIL import Image

    img = tmp_path / "123.jpg"
    Image.new("RGB", (32, 16), (255, 0, 0)).save(img)
    rec = build_frame_record(img, synthetic_video)
    assert rec["frameidx"] == 123
    assert rec["frameid"] == "123.jpg"
    assert rec["media_type"] == "image"
    assert rec["metadata"]["width"] == 32 and rec["metadata"]["height"] == 16
    assert rec["metadata"]["num_channels"] == 3
    assert rec["text_detections"] == {"detections": []}
    assert rec["object_detections"] == {"detections": []}
    assert isinstance(rec["id"], str) and len(rec["id"]) == 36


def test_full_pipeline(synthetic_video, tmp_path):
    from evr_tpu.index import EmbeddingEngine, FrameIndex, VideoRegistry
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
    from evr_tpu.query import MetadataStore

    small = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    engine = EmbeddingEngine(cfg=small, batch_size=4)
    data_root = DataRootConfig(tmp_path / "data")
    index = FrameIndex(embed_dim=32, pad_multiple=64)
    registry = VideoRegistry(data_root.mapping_path)
    store = MetadataStore()

    result = ingest_video(
        synthetic_video, data_root, engine, index, registry, store
    )
    assert result.n_frames == 2
    assert index.total_frames == 2
    assert store.frames("twoscene")
    assert registry.get("twoscene")["embeddings_file"].endswith(
        "twoscene_embeddings.npy"
    )
    emb = np.load(result.embeddings_file)
    assert emb.shape == (2, 32)
    records = json.loads(open(result.metadata_file).read())
    assert [r["frameid"] for r in records] == ["15.jpg", "45.jpg"]
    # search works end to end
    hits = index.search(emb[1], top_k=1)[0]
    assert hits[0].frame_name == "45.jpg"
