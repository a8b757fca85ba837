"""A/B comparison CLI end-to-end (with an exported checkpoint) + trainer
resume-from-checkpoint."""

import json

import numpy as np
import pytest

import jax

from evr_tpu.models import ClassifierConfig, init_classifier_params, init_clip_params
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
from evr_tpu.models.torch_export import save_reference_checkpoint

torch = pytest.importorskip("torch")


def small_cfg():
    return CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )


def test_ab_compare_cli(tmp_path, monkeypatch, rng):
    from PIL import Image

    import evr_tpu.tools.ab_compare as ab
    from evr_tpu.index import EmbeddingEngine

    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(3):
        Image.new("RGB", (64, 64), (i * 70, 30, 30)).save(frames / f"{i}.jpg")

    cfg = small_cfg()
    # export a "fine-tuned" checkpoint with different random weights
    ft_params = init_clip_params(jax.random.PRNGKey(9), cfg)
    ckpt = tmp_path / "ft.pt"
    save_reference_checkpoint(
        ckpt,
        ft_params,
        init_classifier_params(jax.random.PRNGKey(1), ClassifierConfig(embed_dim=32)),
    )

    monkeypatch.setattr(
        "evr_tpu.index.EmbeddingEngine",
        lambda *a, **k: EmbeddingEngine(cfg=cfg, batch_size=4),
    )
    out = tmp_path / "ab.json"
    ab.main(
        [
            "--frames-dir", str(frames),
            "--queries", "a red square",
            "--checkpoint", str(ckpt),
            "--top-k", "2",
            "--output", str(out),
            "--histogram", str(tmp_path / "hist.png"),
        ]
    )
    results = json.loads(out.read_text())
    assert set(results) == {"original", "finetuned"}
    assert len(results["original"]["a red square"]) == 2
    # different weights → different similarity values
    s_orig = results["original"]["a red square"][0]["similarity"]
    s_ft = results["finetuned"]["a red square"][0]["similarity"]
    assert s_orig != s_ft
    assert (tmp_path / "hist.png").exists()


def test_trainer_resume(tmp_path, rng):
    from evr_tpu.training import TrainConfig, Trainer

    cfg = small_cfg()
    clip_params = init_clip_params(jax.random.PRNGKey(0), cfg)
    tc = TrainConfig(
        freeze_layers=0, lr=1e-4, batch_size=4, epochs=2,
        compute_dtype="float32", save_dir=str(tmp_path / "ck"),
    )

    def batch(rng_):
        tokens = np.zeros((4, 77), np.int32)
        tokens[:, 0] = 1
        tokens[:, 1] = 400
        return {
            "images": (rng_.random((4, 64, 64, 3)) * 255).astype(np.uint8),
            "tokens": tokens,
            "labels": rng_.integers(0, 3, size=4).astype(np.int32),
        }

    batches = [batch(rng)]
    trainer = Trainer(cfg, clip_params, tc, log_fn=lambda s: None)
    trainer.fit(lambda e: iter(batches), lambda e: iter(batches))
    assert len(trainer.history) == 2

    # resume: a new trainer with epochs=4 continues from epoch 2
    import dataclasses

    tc2 = dataclasses.replace(tc, epochs=4)
    trainer2 = Trainer(cfg, clip_params, tc2, log_fn=lambda s: None)
    result = trainer2.fit(
        lambda e: iter(batches), lambda e: iter(batches),
        resume_from="final_checkpoint",
    )
    epochs_run = [row["epoch"] for row in trainer2.history]
    assert epochs_run == [2, 3]

    # optimizer moments survive the checkpoint round trip (not re-zeroed)
    trainer3 = Trainer(cfg, clip_params, tc2, log_fn=lambda s: None)
    trainer3.restore_checkpoint("final_checkpoint")
    moments = [np.abs(np.asarray(l)).sum() for l in jax.tree.leaves(trainer3.state.opt_state)]
    assert any(m > 0 for m in moments)
