"""FLIP-style random patch masking (arxiv 2212.00794, PAPERS.md).

Training-time speedup: the vision tower runs on a random subset of patch
tokens. Pinned here: identity keep == full forward exactly, masked training
steps are finite and train, and masked forwards genuinely use fewer tokens.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evr_tpu.models import clip as jclip


@pytest.fixture(scope="module")
def cfg():
    return jclip.CLIPConfig(
        embed_dim=32,
        vision=jclip.VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=jclip.TextConfig(context_length=16, vocab_size=512, width=64, layers=2, heads=4),
    )


@pytest.fixture(scope="module")
def params(cfg):
    return jclip.init_clip_params(jax.random.PRNGKey(0), cfg)


def test_identity_patch_keep_equals_full_forward(cfg, params):
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(3, 32, 32, 3)).astype(np.float32))
    P = cfg.vision.grid ** 2
    keep_all = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (3, P))
    full = jclip.encode_image(params, cfg, pixels)
    kept = jclip.encode_image(params, cfg, pixels, patch_keep=keep_all)
    np.testing.assert_allclose(np.asarray(full), np.asarray(kept), rtol=1e-6, atol=1e-6)


def test_masked_forward_depends_only_on_kept_patches(cfg, params):
    """Keeping the same 4 patches must give identical embeddings no matter
    what the dropped patches contain (masking really removes them)."""
    rng = np.random.default_rng(1)
    base = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    corrupted = base.copy()
    corrupted[:, 16:, 16:, :] = 99.0  # bottom-right quadrant = patches with x,y >= 2
    # grid is 4x4; keep the top-left quadrant patches {0,1,4,5}
    keep = jnp.asarray([[0, 1, 4, 5]], jnp.int32)
    e1 = jclip.encode_image(params, cfg, jnp.asarray(base), patch_keep=keep)
    e2 = jclip.encode_image(params, cfg, jnp.asarray(corrupted), patch_keep=keep)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-6, atol=1e-6)


def test_train_step_with_patch_drop_trains(cfg):
    from evr_tpu.models import ClassifierConfig, init_classifier_params
    from evr_tpu.training import TrainConfig, make_optimizer, make_train_step
    from evr_tpu.training.finetune import TrainState

    rng = np.random.default_rng(2)
    params = {
        "clip": jclip.init_clip_params(jax.random.PRNGKey(0), cfg),
        "classifier": init_classifier_params(
            jax.random.PRNGKey(1), ClassifierConfig(embed_dim=32)
        ),
    }
    tc = TrainConfig(
        freeze_layers=0, batch_size=4, compute_dtype="float32", patch_drop=0.5
    )
    opt = make_optimizer(tc, params)
    step, _ = make_train_step(cfg, ClassifierConfig(embed_dim=32), tc, opt)
    state = TrainState(
        params=jax.tree.map(jnp.asarray, params),
        opt_state=opt.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    tokens = np.zeros((4, 16), np.int32)
    tokens[:, 0] = 1
    tokens[:, 1] = 511
    batch = {
        "images": jnp.asarray((rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)),
        "tokens": jnp.asarray(tokens),
        "labels": jnp.asarray(rng.integers(0, 3, size=4).astype(np.int32)),
    }
    before = np.asarray(state.params["clip"]["visual"]["proj"])
    losses = []
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        loss = float(metrics["total_loss"])
        assert np.isfinite(loss)
        losses.append(loss)
    after = np.asarray(state.params["clip"]["visual"]["proj"])
    assert not np.allclose(before, after)  # params actually moved
    # different rng keys -> different masks -> the two losses differ
    assert losses[0] != losses[1]


def test_eval_step_ignores_patch_drop(cfg):
    """Validation must run the FULL sequence (and a deterministic classifier
    head) even when training uses patch_drop — early stopping and best-model
    selection measure the model that serves."""
    from evr_tpu.models import ClassifierConfig, init_classifier_params
    from evr_tpu.training import TrainConfig, make_optimizer, make_train_step
    from evr_tpu.training.finetune import TrainState

    rng = np.random.default_rng(3)
    params = {
        "clip": jclip.init_clip_params(jax.random.PRNGKey(0), cfg),
        "classifier": init_classifier_params(
            jax.random.PRNGKey(1), ClassifierConfig(embed_dim=32)
        ),
    }
    tokens = np.zeros((4, 16), np.int32)
    tokens[:, 0] = 1
    tokens[:, 1] = 511
    batch = {
        "images": jnp.asarray((rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)),
        "tokens": jnp.asarray(tokens),
        "labels": jnp.asarray(rng.integers(0, 3, size=4).astype(np.int32)),
    }

    def eval_loss(patch_drop):
        tc = TrainConfig(
            freeze_layers=0, batch_size=4, compute_dtype="float32",
            patch_drop=patch_drop,
        )
        opt = make_optimizer(tc, params)
        _, eval_step = make_train_step(cfg, ClassifierConfig(embed_dim=32), tc, opt)
        state = TrainState(
            params=jax.tree.map(jnp.asarray, params),
            opt_state=opt.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        return float(eval_step(state, batch)["total_loss"])

    assert eval_loss(0.9) == pytest.approx(eval_loss(0.0), rel=1e-6)
