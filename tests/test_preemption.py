"""Preemption-safe training: mid-epoch autosave every N batches, SIGTERM →
autosave-and-exit, and mid-epoch resume that skips consumed batches.

The reference checkpoints per-epoch only (`clip_finetune_correct.py:518-545`);
TPU pods are preemptible in production, so step-level resumability is
first-class here.
"""

import os
import signal

import numpy as np
import pytest

import jax

from evr_tpu.models import ClassifierConfig, init_classifier_params
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, init_clip_params
from evr_tpu.training.finetune import TrainConfig, Trainer


def tiny_cfg():
    return CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=TextConfig(context_length=16, vocab_size=600, width=64, layers=2, heads=4),
    )


def batch(rng, n=4):
    tokens = np.zeros((n, 16), np.int32)
    tokens[:, 0] = 1
    tokens[:, 1] = 599
    return {
        "images": (rng.random((n, 32, 32, 3)) * 255).astype(np.uint8),
        "tokens": tokens,
        "labels": rng.integers(0, 3, size=n).astype(np.int32),
    }


def make_trainer(tmp_path, **cfg_kwargs):
    cfg = tiny_cfg()
    tc = TrainConfig(
        freeze_layers=0, lr=1e-4, batch_size=4, epochs=2,
        compute_dtype="float32", save_dir=str(tmp_path / "ckpt"), **cfg_kwargs,
    )
    return Trainer(
        cfg,
        init_clip_params(jax.random.PRNGKey(0), cfg),
        tc,
        classifier_params=init_classifier_params(
            jax.random.PRNGKey(1), ClassifierConfig(embed_dim=32)
        ),
    )


def test_autosave_every_n_and_midepoch_resume(tmp_path, rng):
    consumed = []

    def batches_fn(epoch):
        def gen():
            for i in range(5):
                consumed.append((epoch, i))
                yield batch(rng)
        return gen()

    tr = make_trainer(tmp_path, save_every_steps=2)
    tr.cfg.epochs = 1
    tr.fit(batches_fn)
    auto = tmp_path / "ckpt" / "autosave"
    assert auto.exists()

    # the last autosave recorded batch 4 of epoch 0
    tr2 = make_trainer(tmp_path, save_every_steps=0)
    tr2.cfg.epochs = 1
    consumed.clear()
    payload = tr2.restore_checkpoint("autosave")
    assert payload["batches_done"] == 4 and payload["epoch"] == 0

    tr3 = make_trainer(tmp_path, save_every_steps=0)
    tr3.cfg.epochs = 1
    consumed.clear()
    tr3.fit(batches_fn, resume_from="autosave")
    # islice consumes the 4 skipped batches from the generator but only the
    # remaining 1 is staged+trained
    assert tr3.history[-1]["train_batches"] == 1


def test_sigterm_triggers_autosave_and_clean_exit(tmp_path, rng):
    tr = make_trainer(tmp_path)
    tr.cfg.epochs = 1
    prev = signal.getsignal(signal.SIGTERM)
    try:
        tr.install_preemption_autosave()

        def batches_fn(epoch):
            def gen():
                for i in range(5):
                    if i == 2:  # preemption arrives mid-epoch
                        os.kill(os.getpid(), signal.SIGTERM)
                    yield batch(rng)
            return gen()

        out = tr.fit(batches_fn)
    finally:
        signal.signal(signal.SIGTERM, prev)
    assert out["preempted"] is True
    payload = make_trainer(tmp_path).restore_checkpoint("autosave")
    assert payload["batches_done"] >= 1
    # params in the autosave are the post-step params at preemption time
    leaf = payload["params"]["clip"]["logit_scale"]
    assert np.isfinite(np.asarray(leaf)).all()
