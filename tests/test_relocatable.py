"""Relocatability: a data root with RELATIVE registry paths boots after the
whole directory moves (the failure mode that strands the reference's own
fixtures — absolute Windows paths in video_mapping.json)."""

import json
import shutil

import numpy as np
import pytest

from evr_tpu.config import DataRootConfig
from evr_tpu.index import EmbeddingEngine, VideoRegistry
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
from evr_tpu.serving import ServingContext


def small_engine():
    cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    return EmbeddingEngine(cfg=cfg, batch_size=4)


def test_relative_registry_survives_relocation(tmp_path, rng):
    # build a data root with RELATIVE registry paths
    original = tmp_path / "siteA" / "data"
    root = DataRootConfig(original).ensure()
    emb = rng.normal(size=(6, 32)).astype(np.float32)
    np.save(root.embedding_dir / "v_embeddings.npy", emb)
    records = [
        {"frameidx": i, "frameid": f"{i}.jpg", "video": "videos/v/v.mp4"}
        for i in range(6)
    ]
    (root.metadata_dir / "v_metadata.json").write_text(json.dumps(records))
    video = root.video_dir / "v.mp4"
    video.write_bytes(b"stub")
    reg = VideoRegistry(root.mapping_path)
    reg.add(
        "v",
        metadata_file="metadata/v_metadata.json",
        embeddings_file="embedding/v_embeddings.npy",
        video_path="videos/v.mp4",
        frames_dir="frames/v",
        embedding_model="original",
    )

    # relocate the entire data root
    moved = tmp_path / "siteB" / "data"
    moved.parent.mkdir(parents=True)
    shutil.move(str(original), str(moved))

    ctx = ServingContext(DataRootConfig(moved), engine=small_engine())
    loaded = ctx.boot()
    assert loaded == ["v"]
    assert ctx.index_for("original").total_frames == 6
    assert len(ctx.metadata.frames("v")) == 6
