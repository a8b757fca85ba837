"""Data prep: splits, merges, token audit, augmentation, captioning, CLIs."""

import json

import numpy as np
import pytest

from evr_tpu.data_prep import (
    AugmentConfig,
    TemplateCaptioner,
    audit_token_limits,
    augment_caption,
    build_mixed_testset,
    caption_folder,
    merge_caption_jsons,
    split_caption_json,
)


@pytest.fixture()
def caption_json(tmp_path):
    data = {
        f"frames/{i}.jpg": {"caption": f"caption number {i}", "category": "Violence"}
        for i in range(20)
    }
    data["frames/long.jpg"] = {"caption": "word " * 120, "category": "Violence"}
    path = tmp_path / "caps.json"
    path.write_text(json.dumps(data))
    return path


def test_split_deterministic(caption_json, tmp_path):
    t1, v1 = split_caption_json(caption_json, tmp_path / "t1.json", tmp_path / "v1.json")
    t2, v2 = split_caption_json(caption_json, tmp_path / "t2.json", tmp_path / "v2.json")
    assert (t1, v1) == (t2, v2)
    assert v1 == int(21 * 0.2)
    train = json.loads((tmp_path / "t1.json").read_text())
    val = json.loads((tmp_path / "v1.json").read_text())
    assert set(train) | set(val) == set(json.loads(caption_json.read_text()))
    assert not set(train) & set(val)


def test_merge_with_category_override(caption_json, tmp_path):
    other = tmp_path / "other.json"
    other.write_text(json.dumps({"x.jpg": {"caption": "c", "category": "Sensitive content"}}))
    n = merge_caption_jsons([caption_json, other], tmp_path / "merged.json",
                           category_override="Violence")
    merged = json.loads((tmp_path / "merged.json").read_text())
    assert n == 22
    assert merged["x.jpg"]["category"] == "Violence"


def test_token_audit(caption_json):
    report = audit_token_limits(caption_json)
    assert report["total"] == 21
    assert len(report["over_limit"]) == 1
    assert report["over_limit"][0]["path"] == "frames/long.jpg"
    assert report["max_tokens"] > 77


def test_augment_protects_keywords():
    cfg = AugmentConfig(protected_keywords=("fighting",), synonym_prob=1.0, seed=1)
    out = augment_caption("a man fighting in the street", cfg)
    assert "fighting" in out
    assert out != "a man fighting in the street"  # man/street substituted

    # dropout never drops protected words
    cfg2 = AugmentConfig(protected_keywords=("fighting",), dropout_prob=1.0)
    out2 = augment_caption("a man fighting here", cfg2, strategy="dropout")
    assert "fighting" in out2


def test_caption_folder_and_mixed_testset(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(4):
        Image.new("RGB", (8, 8), (i * 40, 0, 0)).save(img_dir / f"f{i}.jpg")
    out = caption_folder(img_dir, tmp_path / "caps_out.json", TemplateCaptioner(), "Violence")
    assert len(out) == 4
    assert all(v["category"] == "Violence" for v in out.values())
    assert "violent" in out["f0.jpg"]["caption"]

    manifest = build_mixed_testset(
        {"violence": str(img_dir)}, tmp_path / "mixed", per_class=2
    )
    assert len(manifest["violence"]) == 2
    assert (tmp_path / "mixed" / "labels.json").exists()


def test_clipscore(tmp_path, rng):
    from PIL import Image

    from evr_tpu.data_prep import clipscore_captions
    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    data = {}
    for i in range(3):
        Image.new("RGB", (64, 64), (i * 60, 10, 10)).save(img_dir / f"f{i}.jpg")
        data[f"f{i}.jpg"] = {"caption": f"a red square {i}"}
    (tmp_path / "caps.json").write_text(json.dumps(data))
    small = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    engine = EmbeddingEngine(cfg=small, batch_size=4)
    report = clipscore_captions(engine, tmp_path / "caps.json", img_dir,
                                out_csv=tmp_path / "scores.csv")
    assert len(report["scores"]) == 3
    assert (tmp_path / "scores.csv").exists()
    assert np.isfinite(report["mean"])


def test_retrieve_cli(tmp_path, monkeypatch):
    """Drive the retrieval-twin CLI end to end with the small model."""
    from PIL import Image

    import evr_tpu.tools.retrieve as retrieve
    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig

    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(3):
        Image.new("RGB", (64, 64), (i * 70, 20, 20)).save(frames / f"{i * 10}.jpg")

    small = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    monkeypatch.setattr(
        "evr_tpu.index.EmbeddingEngine",
        lambda *a, **k: EmbeddingEngine(cfg=small, batch_size=4),
    )
    out = tmp_path / "res.json"
    grid = tmp_path / "grid.png"
    retrieve.main(
        [
            "--frames-dir", str(frames),
            "--queries", "red frame", "dark frame",
            "--top-k", "2",
            "--output", str(out),
            "--grid", str(grid),
        ]
    )
    results = json.loads(out.read_text())
    assert set(results) == {"red frame", "dark frame"}
    assert all(len(v) == 2 for v in results.values())
    assert all("similarity" in r for v in results.values() for r in v)
    assert grid.exists() and grid.stat().st_size > 0


def test_distill_cli(tmp_path):
    """Drive the distillation CLI end to end on the tiny geometry and serve
    the resulting student checkpoint."""
    import json

    from PIL import Image

    import numpy as np

    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.tools import distill

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    caps = {}
    rng = np.random.default_rng(0)
    for i in range(8):
        name = f"f{i}.jpg"
        Image.fromarray(
            (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        ).save(imgs / name)
        caps[name] = {"caption": f"synthetic frame {i}", "category": "NonViolence"}
    (tmp_path / "caps.json").write_text(json.dumps(caps))

    distill.main([
        "--train-json", str(tmp_path / "caps.json"),
        "--data-dir", str(imgs),
        "--student-model", "ViT-Tiny-Test",
        "--teacher-model", "ViT-Tiny-Test",
        "--epochs", "1", "--batch-size", "8",
        "--save-dir", str(tmp_path / "out"),
    ])
    assert (tmp_path / "out" / "history.json").exists()
    engine = EmbeddingEngine.from_checkpoint(
        str(tmp_path / "out" / "student"), "ViT-Tiny-Test"
    )
    feats = engine.encode_texts(["a synthetic frame"])
    assert np.isfinite(feats).all()
