"""BASELINE config 3 end-to-end: decode + segment a multi-scene video →
frame embeddings → R@K/MRR evaluation on an Excel-style test set."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from evr_tpu.config import DataRootConfig
from evr_tpu.evaluation import ModelComparison
from evr_tpu.evaluation.datasets import load_excel_testset
from evr_tpu.index import EmbeddingEngine, FrameIndex, VideoRegistry
from evr_tpu.ingest import ingest_video
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
from evr_tpu.query import MetadataStore


def test_full_video_path(tmp_path, rng):
    # 1. multi-scene synthetic video (4 hard cuts)
    video = tmp_path / "multi.mp4"
    writer = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 64))
    # alternate brightness strongly so the HSV content delta clears the
    # threshold at every cut (hue-only changes average below 30)
    colors = [(230, 230, 230), (20, 0, 80), (0, 220, 220), (40, 40, 0)]
    for scene, (b, g, r) in enumerate(colors):
        for _ in range(25):
            frame = np.zeros((64, 64, 3), np.uint8)
            frame[:, :] = (b, g, r)
            writer.write(frame)
    writer.release()

    # 2. ingest: decode → segment → embed → metadata → index
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
    result = ingest_video(video, data_root, engine, index, registry, store)
    assert result.n_frames == 4  # one representative frame per scene

    # 3. Excel-style test set over the extracted frames (csv accepted)
    frames_dir = tmp_path / "data" / "frames" / "multi"
    names = sorted(p.name for p in frames_dir.iterdir())
    rows = ["folder,caption,image"]
    for i, name in enumerate(names):
        rows.append(f"multi,a solid color scene number {i},{name}")
    # multi-ground-truth row: two frames acceptable for one caption
    rows.append(f"multi,any colored scene,{names[0]};{names[1]}")
    testset = tmp_path / "testset.csv"
    testset.write_text("\n".join(rows))
    dataset = load_excel_testset(testset, tmp_path / "data" / "frames")
    assert len(dataset.captions) == 5
    assert dataset.caption_gt_ids[-1] == [f"multi/{names[0]}", f"multi/{names[1]}"]

    # 4. R@K/MRR evaluation through the comparison harness
    from evr_tpu.evaluation import EngineAdapter

    comp = ModelComparison(output_dir=tmp_path / "out", log=lambda s: None)
    comp.register("model", lambda: EngineAdapter(engine))
    results = comp.run_evaluation(dataset)
    res = results["model"]
    assert set(res["t2i"]) >= {"R@1", "R@5", "R@10", "MRR"}
    assert "multi_gt" in res and "P@5" in res["multi_gt"]
    assert np.isfinite(res["mean"]["rsum"])
    csv_path = comp.save_csv()
    assert csv_path.exists()
