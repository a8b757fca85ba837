"""Muon optimizer (`training/muon.py`): Newton–Schulz spectrum flattening,
update semantics, parameter routing, and the end-to-end Trainer path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from evr_tpu.training.muon import (
    muon,
    muon_param_labels,
    newton_schulz_orthogonalize,
)


def test_newton_schulz_flattens_the_spectrum():
    """NS₅ drives all singular values into the method's ~[0.7, 1.2] band
    (exact orthogonality is not the goal — a flat spectrum is)."""
    rng = np.random.default_rng(0)
    for shape in [(32, 32), (16, 48), (48, 16)]:
        g = rng.standard_normal(shape).astype(np.float32)
        # condition the input badly on purpose
        g[0] *= 50.0
        o = np.asarray(newton_schulz_orthogonalize(jnp.asarray(g)))
        assert o.shape == g.shape
        sv = np.linalg.svd(o, compute_uv=False)
        assert sv.max() < 1.6 and sv.min() > 0.3
        # the orthogonalized update keeps the original's row/column space:
        # inner product with the input stays strongly positive
        assert float((o * g).sum()) > 0


def test_newton_schulz_rejects_non_2d():
    with pytest.raises(ValueError, match="2-D"):
        newton_schulz_orthogonalize(jnp.ones((3, 3, 3)))


def test_muon_descends_on_a_matrix_problem():
    """Plain Muon minimizes ||W - A||² (its update is the orthogonalized
    gradient direction — descent, not raw gradient scale)."""
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((24, 24)).astype(np.float32))
    w = jnp.zeros_like(a)
    opt = muon(learning_rate=0.1, momentum=0.9)
    state = opt.init(w)

    def loss(w):
        return 0.5 * jnp.sum(jnp.square(w - a))

    l0 = float(loss(w))
    for _ in range(60):
        g = jax.grad(loss)(w)
        upd, state = opt.update(g, state)
        w = optax.apply_updates(w, upd)
    assert float(loss(w)) < 0.05 * l0


def test_muon_param_labels_routing():
    from evr_tpu.models import init_clip_params
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig

    cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=1, heads=4),
        text=TextConfig(context_length=16, vocab_size=100, width=64, layers=1, heads=4),
    )
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    labels = muon_param_labels(params)
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): lab
        for path, lab in jax.tree_util.tree_flatten_with_path(labels)[0]
    }
    # hidden block linears -> muon
    muon_keys = [k for k, v in flat.items() if v == "muon"]
    assert any("mlp" in k for k in muon_keys)
    assert any("attn" in k or "qkv" in k or "out" in k for k in muon_keys)
    # everything OUTSIDE the block stacks -> adamw, including CLIP's
    # visual projection (named just 'proj') and the text projection
    for k, v in flat.items():
        if "blocks" not in k:
            assert v == "adamw", k
    assert flat.get("visual/proj", "adamw") == "adamw"
    assert all(v in ("muon", "adamw") for v in flat.values())


def test_trainer_with_muon_optimizer_descends():
    from evr_tpu.models import ClassifierConfig
    from evr_tpu.training import (
        TrainConfig, Trainer, make_optimizer, make_train_step,
    )
    from evr_tpu.training.finetune import TrainState
    from tests.test_training import _make_params, tiny_batch

    rng = np.random.default_rng(2)
    cfg, clip_params, cls = _make_params()
    params = {"clip": clip_params, "classifier": cls}
    tc = TrainConfig(
        freeze_layers=0, lr=1e-4, batch_size=8, compute_dtype="float32",
        optimizer="muon",
    )
    trainer = Trainer(cfg, clip_params, tc, classifier_params=cls,
                      log_fn=lambda s: None)
    opt = make_optimizer(tc, params)
    step, _ = make_train_step(
        trainer.model_cfg, ClassifierConfig(embed_dim=32), tc, opt
    )
    fresh = jax.tree.map(lambda a: jnp.asarray(np.array(a)), params)
    state = TrainState(
        params=fresh, opt_state=opt.init(fresh),
        step=jnp.zeros((), jnp.int32),
    )
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, 8).items()}
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # same-batch refit must descend


def test_unknown_optimizer_rejected():
    from evr_tpu.training import TrainConfig, make_optimizer

    from evr_tpu.models import init_classifier_params, ClassifierConfig
    from evr_tpu.models.clip import init_clip_params
    from tests.test_training import tiny_cfg

    params = {
        "clip": init_clip_params(jax.random.PRNGKey(0), tiny_cfg()),
        "classifier": None,
    }
    with pytest.raises(ValueError, match="unknown optimizer"):
        make_optimizer(TrainConfig(optimizer="sgdqq"), params)


def test_muon_mesh_step_matches_single_device():
    """One dp step under Muon on the 8-device mesh == the same global batch
    on one device — the repo's exactness bar for every training feature.
    Also checks a hidden matrix moved (Muon actually fired)."""
    from evr_tpu.models import ClassifierConfig
    from evr_tpu.parallel import get_mesh
    from evr_tpu.training import (
        TrainConfig, make_optimizer, make_train_step,
    )
    from evr_tpu.training.finetune import TrainState
    from tests.test_training import _make_params, tiny_batch

    rng = np.random.default_rng(3)
    cfg, clip_params, cls = _make_params()
    params = {"clip": clip_params, "classifier": cls}
    tc = TrainConfig(
        freeze_layers=0, lr=1e-4, batch_size=16, compute_dtype="float32",
        optimizer="muon",
    )
    batch_np = tiny_batch(rng, 16)

    results = []
    for mesh in (None, get_mesh(len(jax.devices()))):
        opt = make_optimizer(tc, params)
        step, _ = make_train_step(cfg, ClassifierConfig(embed_dim=32), tc, opt, mesh=mesh)
        fresh = jax.tree.map(lambda a: jnp.asarray(np.array(a)), params)
        state = TrainState(
            params=fresh, opt_state=opt.init(fresh),
            step=jnp.zeros((), jnp.int32),
        )
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        results.append((
            float(metrics["contrastive_loss"]),
            np.asarray(jax.tree_util.tree_leaves(state.params["clip"])[0]),
            state.params,
        ))

    (l1, _, p1), (l2, _, p2) = results
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    # dp grads match single-device up to fp32 reduction order; Muon's bf16
    # Newton-Schulz amplifies those ulp-level input differences (unlike
    # elementwise AdamW), so params agree to ~bf16 precision of the UPDATE,
    # not fp32 of the grads — the loss equality above is the exactness
    # claim, this bound pins the update to the same direction/magnitude.
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-2, atol=2e-5
        )
    # Muon moved the hidden matrices (not just the AdamW leaves)
    from evr_tpu.training.muon import muon_param_labels

    labels = muon_param_labels(params)
    moved = [
        not np.allclose(np.asarray(orig), np.asarray(new))
        for orig, new, lab in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(p1),
            jax.tree_util.tree_leaves(labels),
        )
        if lab == "muon"
    ]
    assert moved and all(moved)
