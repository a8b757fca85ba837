"""CLI tools driven end-to-end with small models: ingest, export_embeddings,
batch prefetch."""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from evr_tpu.index import EmbeddingEngine
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig


def small_engine(*a, **k):
    cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    return EmbeddingEngine(cfg=cfg, batch_size=4)


def _make_video(path, n=40):
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 64))
    for i in range(n):
        f = np.zeros((64, 64, 3), np.uint8)
        f[:, :, 0 if i < n // 2 else 2] = 200
        w.write(f)
    w.release()


def test_ingest_cli(tmp_path, monkeypatch):
    import evr_tpu.tools.ingest as ingest_cli

    video = tmp_path / "clip.mp4"
    _make_video(video)
    monkeypatch.setattr("evr_tpu.index.EmbeddingEngine", small_engine)
    ingest_cli.main([str(video), "--data-root", str(tmp_path / "data")])
    emb = np.load(tmp_path / "data" / "embedding" / "clip_embeddings.npy")
    assert emb.shape == (2, 32)
    mapping = json.loads(
        (tmp_path / "data" / "metadata" / "video_mapping.json").read_text()
    )
    assert mapping["clip"]["embedding_model"] == "original"


def test_ingest_cli_uniform(tmp_path, monkeypatch):
    import evr_tpu.tools.ingest as ingest_cli

    video = tmp_path / "u.mp4"
    _make_video(video)
    monkeypatch.setattr("evr_tpu.index.EmbeddingEngine", small_engine)
    ingest_cli.main(
        [str(video), "--data-root", str(tmp_path / "data"), "--uniform", "6",
         "--scene-threshold", "900"]  # scene pass finds nothing extra
    )
    frames = list((tmp_path / "data" / "frames" / "u").glob("*.jpg"))
    assert len(frames) >= 6


def test_export_embeddings_cli(tmp_path, monkeypatch):
    from PIL import Image

    import evr_tpu.tools.export_embeddings as export_cli

    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(5):
        Image.new("RGB", (64, 64), (i * 40, 0, 0)).save(frames / f"{i}.jpg")
    monkeypatch.setattr("evr_tpu.index.EmbeddingEngine", small_engine)
    out = tmp_path / "out" / "emb.npy"
    export_cli.main(
        ["--frames-dir", str(frames), "--out", str(out), "--chunk-size", "2"]
    )
    emb = np.load(out)
    assert emb.shape == (5, 32)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-4)
    names = json.loads(out.with_suffix(".names.json").read_text())
    assert names == [f"{i}.jpg" for i in range(5)]


def test_prefetch_batches(rng):
    from evr_tpu.training.data import prefetch_batches

    items = [{"i": i} for i in range(7)]
    out = list(prefetch_batches(iter(items), depth=2))
    assert out == items

    def boom():
        yield {"ok": 1}
        raise RuntimeError("producer failed")

    collected = []
    with pytest.raises(RuntimeError):
        for item in prefetch_batches(boom()):
            collected.append(item)
    assert collected == [{"ok": 1}]


def test_retrieve_cli_with_moe_orbax_checkpoint(tmp_path):
    """retrieve --checkpoint <Trainer MoE orbax dir>: the CLI serves a
    sparse checkpoint end-to-end — EmbeddingEngine.from_checkpoint rebuilds
    the MoEConfig from the self-describing payload (no model code changes
    on the host side)."""
    import evr_tpu.tools.retrieve as retrieve_cli
    import jax
    from evr_tpu.models import get_model_config, init_clip_params
    from evr_tpu.models.moe import MoEConfig
    from evr_tpu.training.finetune import TrainConfig, Trainer

    cfg = get_model_config("ViT-Tiny-Test")
    moe = MoEConfig(n_experts=2, router_k=2, capacity_factor=2.0)
    tr = Trainer(
        cfg,
        init_clip_params(jax.random.PRNGKey(0), cfg),
        TrainConfig(
            batch_size=4, compute_dtype="float32",
            save_dir=str(tmp_path / "ckpt"), moe=moe,
        ),
        log_fn=lambda *_: None,
    )
    tr.save_checkpoint("best", epoch=0, metrics={"val_loss": 1.0})

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(
            str(frames / f"{i}.jpg"),
            rng.integers(0, 255, (64, 64, 3)).astype(np.uint8),
        )

    out = tmp_path / "results.json"
    retrieve_cli.main([
        "--frames-dir", str(frames),
        "--queries", "a red frame",
        "--model", "ViT-Tiny-Test",
        "--checkpoint", str(tmp_path / "ckpt" / "best"),
        "--top-k", "2",
        "--output", str(out),
    ])
    results = json.loads(out.read_text())
    hits = results["a red frame"]
    assert len(hits) == 2
    assert all(np.isfinite(h["similarity"]) for h in hits)
