"""Zero-shot prompt-ensemble classification (`evaluation.zeroshot`).

The CLIP paper's zero-shot transfer method (prompt ensembling §3.1.4) —
absent from the reference's eval suite, which only benchmarks trained
heads/probes (`compare_model_classification.py`)."""

import numpy as np

import jax

from evr_tpu.evaluation.zeroshot import (
    DEFAULT_TEMPLATES,
    build_zeroshot_classifier,
    evaluate_zeroshot,
    zeroshot_predict,
)


def _synthetic_encoder(classnames, d=16, noise=0.05):
    """Text 'encoder' whose embedding for any prompt mentioning class i is
    e_i + template-dependent noise — lets us verify the ensemble math and
    end-to-end accuracy without a trained model."""
    rng = np.random.default_rng(0)
    basis = np.eye(len(classnames), d, dtype=np.float32) * 3.0

    def encode(prompts):
        out = []
        for p in prompts:
            ci = next(i for i, n in enumerate(classnames) if n in p)
            out.append(basis[ci] + rng.normal(0, noise, d).astype(np.float32))
        return np.stack(out)

    return encode, basis


def test_classifier_shape_and_unit_columns():
    classes = ["fight", "fire", "crowd"]
    encode, _ = _synthetic_encoder(classes)
    W = build_zeroshot_classifier(encode, classes)
    assert W.shape == (16, len(classes))
    np.testing.assert_allclose(np.linalg.norm(W, axis=0), 1.0, atol=1e-5)


def test_ensemble_is_mean_then_renormalise():
    classes = ["cat", "dog"]
    captured = {}

    def encode(prompts):
        captured["prompts"] = prompts
        # two orthogonal unit vectors per class, so the ensemble direction
        # is their bisector — distinguishes mean-then-norm from norm-of-sum
        v = np.zeros((len(prompts), 4), np.float32)
        for i, p in enumerate(prompts):
            ci = 0 if "cat" in p else 1
            v[i, 2 * ci + (i % 2)] = 5.0  # unnormalised input
        return v

    W = build_zeroshot_classifier(encode, classes, templates=("a {}.", "the {}."))
    # every class expanded through every template, class-major order
    assert captured["prompts"] == ["a cat.", "the cat.", "a dog.", "the dog."]
    expected = np.array([1, 1, 0, 0], np.float32) / np.sqrt(2)
    np.testing.assert_allclose(W[:, 0], expected, atol=1e-6)


def test_zeroshot_end_to_end_accuracy():
    classes = ["fight", "fire", "crowd"]
    encode, basis = _synthetic_encoder(classes)
    W = build_zeroshot_classifier(encode, classes)
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 3, size=60)
    feats = basis[labels] + rng.normal(0, 0.1, (60, 16)).astype(np.float32)
    preds = zeroshot_predict(feats, W)
    np.testing.assert_array_equal(preds, labels)
    report = evaluate_zeroshot(feats, labels, W)
    assert report["accuracy"] == 1.0
    assert report["top1_accuracy"] == 1.0
    assert report["top5_accuracy"] == 1.0  # k clamped to n_classes
    assert report["f1_macro"] == 1.0


def test_zeroshot_with_real_tiny_model():
    """Mechanics through the real tokenizer + tiny CLIP text tower: one
    batched encode, deterministic output, correct shapes."""
    import jax.numpy as jnp

    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, encode_text
    from evr_tpu.models.clip import init_clip_params
    from evr_tpu.tokenizer import get_default_tokenizer

    cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=TextConfig(context_length=16, vocab_size=49408, width=64, layers=2, heads=4),
    )
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    tok = get_default_tokenizer()

    calls = []

    def encode_texts(prompts):
        calls.append(len(prompts))
        tokens = tok(prompts, context_length=16)
        return np.asarray(encode_text(params, cfg, jnp.asarray(tokens)))

    classes = ["violence", "explosion"]
    W1 = build_zeroshot_classifier(encode_texts, classes)
    W2 = build_zeroshot_classifier(encode_texts, classes)
    assert calls == [len(classes) * len(DEFAULT_TEMPLATES)] * 2  # one batch per build
    assert W1.shape == (32, 2)
    np.testing.assert_array_equal(W1, W2)
