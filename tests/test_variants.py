"""Trainer variants: fusion loss semantics, projection trainer, progressive
phase machinery, hard-negative mining."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, init_clip_params
from evr_tpu.models.heads import FusionConfig, fusion_forward, init_fusion_params
from evr_tpu.training.variants import (
    ProgressiveTrainer,
    ProgressiveTrainConfig,
    ProjectionTrainer,
    ProjectionTrainConfig,
    hard_negative_infonce,
    mine_hard_negatives,
    multimodal_loss,
)


def tiny_cfg():
    return CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=4, heads=4),
        text=TextConfig(context_length=16, vocab_size=600, width=64, layers=4, heads=4),
    )


def tiny_batch(rng, n=8):
    tokens = np.zeros((n, 16), np.int32)
    for i in range(n):
        tokens[i, :4] = rng.integers(1, 500, size=4)
        tokens[i, 4] = 599
    return {
        "images": (rng.random((n, 32, 32, 3)) * 255).astype(np.uint8),
        "tokens": tokens,
        "labels": rng.integers(0, 3, size=n).astype(np.int32),
    }


def test_multimodal_loss_components(rng):
    n, d, c = 6, 32, 3
    heads = init_fusion_params(jax.random.PRNGKey(0), FusionConfig(d, num_classes=c))
    img = rng.normal(size=(n, d)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt = rng.normal(size=(n, d)).astype(np.float32)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    out = fusion_forward(heads, FusionConfig(d, num_classes=c), jnp.asarray(img), jnp.asarray(txt))
    labels = jnp.asarray(rng.integers(0, c, size=n))
    total, metrics = multimodal_loss(out, labels)
    expected = (
        0.7 * metrics["fusion_loss"]
        + 0.15 * metrics["image_loss"]
        + 0.15 * metrics["text_loss"]
        + metrics["contrastive_loss"]
    )
    np.testing.assert_allclose(float(total), float(expected), rtol=1e-6)

    # V2 extensions change the loss
    total2, m2 = multimodal_loss(
        out, labels, label_smoothing=0.1, entropy_weight=0.01, weight_decay=1e-4,
        trainable_params=heads,
    )
    assert "fusion_entropy" in m2 and "l2" in m2
    assert float(total2) != float(total)


def test_mine_hard_negatives():
    sims = jnp.asarray(
        np.array(
            [[0.9, 0.8, 0.1, 0.2], [0.1, 0.9, 0.85, 0.3], [0.5, 0.4, 0.9, 0.45], [0.2, 0.3, 0.1, 0.9]],
            np.float32,
        )
    )
    idx = np.asarray(mine_hard_negatives(sims, k=1))
    assert idx.tolist() == [[1], [2], [0], [1]]  # hardest off-diagonal per row


def test_hard_negative_loss_upweights(rng):
    d, n = 16, 8
    img = rng.normal(size=(n, d)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt = rng.normal(size=(n, d)).astype(np.float32)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    scale = jnp.asarray(np.log(1 / 0.07), jnp.float32)
    base = float(hard_negative_infonce(jnp.asarray(img), jnp.asarray(txt), scale))
    hard = float(
        hard_negative_infonce(jnp.asarray(img), jnp.asarray(txt), scale, hard_weight=2.0)
    )
    assert hard > base  # up-weighted negatives make the task harder


def test_projection_trainer_trains_heads_only(rng):
    cfg = tiny_cfg()
    clip_params = init_clip_params(jax.random.PRNGKey(0), cfg)
    trainer = ProjectionTrainer(
        cfg,
        clip_params,
        ProjectionTrainConfig(proj_dim=16, lr=1e-3, compute_dtype="float32", num_classes=3),
    )
    before_clip = np.asarray(trainer.params["clip"]["text"]["token_embedding"])
    before_proj = np.asarray(trainer.params["heads"]["image_projection"]["kernel"])
    losses = [trainer.train_step(tiny_batch(rng))["total_loss"] for _ in range(3)]
    assert all(np.isfinite(losses))
    after_clip = np.asarray(trainer.params["clip"]["text"]["token_embedding"])
    after_proj = np.asarray(trainer.params["heads"]["image_projection"]["kernel"])
    np.testing.assert_array_equal(before_clip, after_clip)  # CLIP frozen
    assert np.abs(after_proj - before_proj).max() > 0  # heads train

    img_p, txt_p = trainer.encode_projected(
        tiny_batch(rng)["images"], tiny_batch(rng)["tokens"]
    )
    assert img_p.shape[1] == 16
    np.testing.assert_allclose(np.linalg.norm(img_p, axis=1), 1.0, rtol=1e-4)


def test_progressive_phases(rng):
    cfg = tiny_cfg()
    clip_params = init_clip_params(jax.random.PRNGKey(1), cfg)
    trainer = ProgressiveTrainer(
        cfg, clip_params, ProgressiveTrainConfig(steps_per_phase=4)
    )
    # phase 1: clip frozen
    b = tiny_batch(rng)
    before = np.asarray(trainer.params["clip"]["visual"]["blocks"][3]["mlp"]["fc"]["kernel"])
    m1 = trainer.train_step(b)
    assert m1["phase"] == 1 and np.isfinite(m1["total_loss"])
    after = np.asarray(trainer.params["clip"]["visual"]["blocks"][3]["mlp"]["fc"]["kernel"])
    np.testing.assert_array_equal(before, after)

    # phase 2: last-3 blocks unfreeze, early blocks stay frozen
    trainer.next_phase()
    labels = trainer.labels_for_phase(2)
    assert labels["clip"]["visual"]["blocks"][0]["ln_1"]["scale"] == "frozen"
    assert labels["clip"]["visual"]["blocks"][3]["ln_1"]["scale"] == "late"
    assert labels["clip"]["visual"]["ln_post"]["scale"] == "late"
    early_before = np.asarray(trainer.params["clip"]["visual"]["blocks"][0]["mlp"]["fc"]["kernel"])
    late_before = np.asarray(trainer.params["clip"]["visual"]["blocks"][3]["mlp"]["fc"]["kernel"])
    trainer.train_step(b)
    trainer.train_step(b)  # warmup step 1 has lr 0; step 2 moves
    early_after = np.asarray(trainer.params["clip"]["visual"]["blocks"][0]["mlp"]["fc"]["kernel"])
    late_after = np.asarray(trainer.params["clip"]["visual"]["blocks"][3]["mlp"]["fc"]["kernel"])
    np.testing.assert_array_equal(early_before, early_after)
    assert np.abs(late_after - late_before).max() > 0

    # phase 3: everything trains; cross-phase resume refused
    trainer.next_phase()
    labels3 = trainer.labels_for_phase(3)
    assert labels3["clip"]["visual"]["blocks"][0]["ln_1"]["scale"] == "early"
    with pytest.raises(ValueError):
        trainer._enter_phase(2)


# -- CatLIP (arXiv 2404.15653) ----------------------------------------------


def test_concept_vocab_and_targets():
    from evr_tpu.training.variants import build_concept_vocab, concept_targets

    caps = [
        "a man fighting in the street",
        "the man holds a red umbrella",
        "a dog running in the street",
    ]
    vocab = build_concept_vocab(caps, size=10, min_count=1)
    assert "the" not in vocab and "a" not in vocab  # stopwords filtered
    assert "man" in vocab and "street" in vocab
    t = concept_targets(caps, vocab)
    assert t.shape == (3, len(vocab))
    assert t[0, vocab["man"]] == 1.0 and t[0, vocab["street"]] == 1.0
    assert t[2, vocab["man"]] == 0.0 and t[2, vocab["dog"]] == 1.0
    # min_count pruning
    vocab2 = build_concept_vocab(caps, size=10, min_count=2)
    assert "umbrella" not in vocab2 and "man" in vocab2


def test_catlip_trainer_optimises_vision_only(rng):
    from evr_tpu.training.variants import (
        CatLIPTrainConfig,
        CatLIPTrainer,
        build_concept_vocab,
        concept_targets,
    )

    cfg = tiny_cfg()
    clip_params = init_clip_params(jax.random.PRNGKey(0), cfg)
    caps = ["a man fighting", "a dog running", "a red car", "people on stage"] * 2
    vocab = build_concept_vocab(caps, size=16, min_count=1)
    targets = concept_targets(caps, vocab)
    tr = CatLIPTrainer(
        cfg, clip_params, vocab,
        CatLIPTrainConfig(lr=1e-3, compute_dtype="float32"),
    )
    text_before = np.asarray(tr.params["clip"]["text"]["token_embedding"]).copy()
    batch = {"images": tiny_batch(rng)["images"], "targets": targets}
    losses = [tr.train_step(batch)["bce_loss"] for _ in range(6)]
    assert losses[-1] < losses[0]
    # text tower untouched (never run, never updated)
    np.testing.assert_array_equal(
        text_before, np.asarray(tr.params["clip"]["text"]["token_embedding"])
    )
    # vision tower moved, and the export is a full drop-in CLIP tree
    out = tr.clip_params()
    assert "text" in out and "visual" in out
    assert np.abs(
        np.asarray(out["visual"]["proj"])
        - np.asarray(clip_params["visual"]["proj"])
    ).max() > 0



# -- distillation (MobileCLIP/CLIP-KD style) --------------------------------


def test_distill_kd_zero_when_student_is_teacher(rng):
    """similarity_kd_loss is exactly 0 when student == teacher features."""
    from evr_tpu.training.distill import similarity_kd_loss

    f = np.random.default_rng(0).normal(size=(6, 32)).astype(np.float32)
    f = f / np.linalg.norm(f, axis=-1, keepdims=True)
    g = np.random.default_rng(1).normal(size=(6, 32)).astype(np.float32)
    g = g / np.linalg.norm(g, axis=-1, keepdims=True)
    zero = float(similarity_kd_loss(jnp.asarray(f), jnp.asarray(g),
                                    jnp.asarray(f), jnp.asarray(g)))
    assert abs(zero) < 1e-6
    nonzero = float(similarity_kd_loss(jnp.asarray(g), jnp.asarray(f),
                                       jnp.asarray(f), jnp.asarray(g)))
    assert nonzero > 1e-3


def test_distillation_trainer_optimises_and_freezes_teacher(rng):
    from evr_tpu.training.distill import DistillConfig, DistillationTrainer

    s_cfg = tiny_cfg()
    # teacher: different width/depth, same embed_dim (align term allowed)
    t_cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=96, layers=2, heads=4),
        text=TextConfig(context_length=16, vocab_size=600, width=96, layers=2, heads=4),
    )
    student = init_clip_params(jax.random.PRNGKey(0), s_cfg)
    teacher = init_clip_params(jax.random.PRNGKey(7), t_cfg)
    tr = DistillationTrainer(
        s_cfg, student, t_cfg, teacher,
        DistillConfig(lr=1e-3, compute_dtype="float32",
                      kd_weight=1.0, align_weight=0.5),
    )
    t_before = np.asarray(tr.teacher_params["visual"]["proj"]).copy()
    batch = tiny_batch(rng)
    losses = [tr.train_step(batch) for _ in range(6)]
    assert losses[-1]["total_loss"] < losses[0]["total_loss"]
    assert "align_loss" in losses[0]

    # pure-KD stage (contrastive off): the student provably tracks the
    # teacher's similarity structure
    tr_kd = DistillationTrainer(
        s_cfg, student, t_cfg, teacher,
        DistillConfig(lr=1e-3, compute_dtype="float32",
                      contrastive_weight=0.0, kd_weight=1.0),
    )
    kd_losses = [tr_kd.train_step(batch)["kd_loss"] for _ in range(6)]
    assert kd_losses[-1] < kd_losses[0]
    np.testing.assert_array_equal(
        t_before, np.asarray(tr.teacher_params["visual"]["proj"])
    )


def test_distillation_dim_mismatch_needs_kd_only():
    from evr_tpu.training.distill import DistillConfig, DistillationTrainer

    s_cfg = tiny_cfg()
    t_cfg = CLIPConfig(
        embed_dim=48,
        vision=VisionConfig(image_size=32, patch_size=8, width=96, layers=1, heads=4),
        text=TextConfig(context_length=16, vocab_size=600, width=96, layers=1, heads=4),
    )
    student = init_clip_params(jax.random.PRNGKey(0), s_cfg)
    teacher = init_clip_params(jax.random.PRNGKey(1), t_cfg)
    with pytest.raises(ValueError):
        DistillationTrainer(s_cfg, student, t_cfg, teacher,
                            DistillConfig(align_weight=0.5))
    # similarity-KD alone is dimension-agnostic
    tr = DistillationTrainer(s_cfg, student, t_cfg, teacher,
                             DistillConfig(compute_dtype="float32"))
    m = tr.train_step(tiny_batch(np.random.default_rng(0)))
    assert np.isfinite(m["total_loss"])
