"""Engine model registry: switching, classifier head, per-model caches, and
the classification CLI mode."""

import json

import numpy as np
import pytest

import jax

from evr_tpu.index import EmbeddingEngine, FrameIndex
from evr_tpu.models import ClassifierConfig, init_classifier_params, init_clip_params
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig


def small_cfg():
    return CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )


@pytest.fixture()
def engine():
    cfg = small_cfg()
    e = EmbeddingEngine(cfg=cfg, batch_size=4)
    ft = init_clip_params(jax.random.PRNGKey(7), cfg)
    cls = init_classifier_params(
        jax.random.PRNGKey(8), ClassifierConfig(embed_dim=32, num_classes=3)
    )
    e.register_model("finetuned", ft, cls, ClassifierConfig(embed_dim=32, num_classes=3))
    return e


def test_model_switch_changes_outputs(engine):
    v1 = engine.encode_texts(["a query"])
    assert engine.set_active_model("finetuned")
    v2 = engine.encode_texts(["a query"])
    assert np.abs(v1 - v2).max() > 1e-3
    assert not engine.set_active_model("missing")
    assert engine.active_model == "finetuned"


def test_text_cache_is_per_model(engine):
    a = engine.get_text_features("same query")
    engine.set_active_model("finetuned")
    b = engine.get_text_features("same query")
    assert np.abs(a - b).max() > 1e-3  # cache key includes the model


def test_classifier_head(engine, rng):
    feats = rng.normal(size=(5, 32)).astype(np.float32)
    assert engine.classify(feats) is None  # original has no head
    engine.set_active_model("finetuned")
    probs = engine.classify(feats)
    assert probs.shape == (5, 3)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)


def test_fused_search_respects_model_switch(engine, rng):
    from evr_tpu.index.fused_search import TextSearcher

    index = FrameIndex(embed_dim=32, pad_multiple=64)
    index.add_video("v", rng.normal(size=(30, 32)).astype(np.float32))
    searcher = TextSearcher(engine, index)
    engine.set_active_model("original")
    s1, _ = searcher.search("query", 5)
    engine.set_active_model("finetuned")
    s2, _ = searcher.search("query", 5)
    assert np.abs(s1 - s2).max() > 1e-4  # different model → different scores


def test_bf16_params_dtype(rng):
    cfg = small_cfg()
    from evr_tpu.models import init_clip_params
    import jax as _jax

    params = init_clip_params(_jax.random.PRNGKey(0), cfg)
    f32 = EmbeddingEngine(cfg=cfg, params=params, batch_size=4)
    bf16 = EmbeddingEngine(cfg=cfg, params=params, batch_size=4, params_dtype="bfloat16")
    staged = (rng.random((2, 64, 64, 3)) * 255).astype(np.uint8)
    a = f32.encode_staged_images(staged, normalise=True)
    b = bf16.encode_staged_images(staged, normalise=True)
    cos = (a * b).sum(axis=1)
    assert (cos > 0.99).all()
    # token embeddings stay integer-indexable; tokens unaffected
    t = bf16.encode_texts(["a query"], normalise=True)
    assert np.isfinite(t).all()


def test_classification_cli(tmp_path, monkeypatch, rng):
    from PIL import Image

    import evr_tpu.tools.evaluate as ev

    for cls, color in (("a", (200, 0, 0)), ("b", (0, 0, 200))):
        d = tmp_path / cls
        d.mkdir()
        for i in range(6):
            arr = np.asarray(Image.new("RGB", (64, 64), color), np.uint8).copy()
            arr += rng.integers(0, 30, size=arr.shape).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")

    cfg = small_cfg()
    monkeypatch.setattr(
        "evr_tpu.index.EmbeddingEngine",
        lambda *a, **k: EmbeddingEngine(cfg=cfg, batch_size=4),
    )
    ev.main(
        [
            "--images-dir", str(tmp_path),
            "--output-dir", str(tmp_path / "out"),
            "--classification-dirs", f"a={tmp_path/'a'}", f"b={tmp_path/'b'}",
        ]
    )
    report = json.loads((tmp_path / "out" / "classification_results.json").read_text())
    assert "original" in report
    assert report["original"]["mode"] == "linear_probe"
    assert 0.0 <= report["original"]["accuracy"] <= 1.0


def test_load_finetuned_orbax_dir(tmp_path, rng):
    """engine.load_finetuned accepts a Trainer orbax checkpoint directory
    (the CLI tools' --checkpoint path for JAX-trained models): clip params
    AND the classifier head round-trip, and the loaded model serves."""
    from evr_tpu.training.finetune import TrainConfig, Trainer

    cfg = small_cfg()
    clip_p = init_clip_params(jax.random.PRNGKey(7), cfg)
    cls_p = init_classifier_params(
        jax.random.PRNGKey(8), ClassifierConfig(embed_dim=32, num_classes=3)
    )
    tr = Trainer(
        cfg,
        clip_p,
        TrainConfig(batch_size=4, compute_dtype="float32", save_dir=str(tmp_path)),
        classifier_params=cls_p,
        cls_cfg=ClassifierConfig(embed_dim=32, num_classes=3),
        log_fn=lambda *_: None,
    )
    tr.save_checkpoint("best", epoch=0, metrics={"val_loss": 1.0})

    e = EmbeddingEngine(cfg=cfg, batch_size=4)
    base = e.encode_texts(["a query"])
    e.load_finetuned(tmp_path / "best")
    # relative paths must work too (orbax itself wants absolute ones)
    import os

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        e.load_finetuned("best", name="finetuned_rel")
    finally:
        os.chdir(cwd)
    assert e.set_active_model("finetuned")
    loaded = e.encode_texts(["a query"])
    # identical params → identical features (orbax round trip is lossless)
    ref = EmbeddingEngine(cfg=cfg, params=clip_p, batch_size=4).encode_texts(["a query"])
    np.testing.assert_allclose(loaded, ref, atol=1e-6)
    assert np.isfinite(base).all()
    feats = rng.normal(size=(3, 32)).astype(np.float32)
    probs = e.classify(feats)
    assert probs is not None and probs.shape == (3, 3)
