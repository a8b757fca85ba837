"""Training stack: freeze semantics, loss parity single-vs-mesh, optimisation
progress, checkpoint roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evr_tpu.models import ClassifierConfig, init_classifier_params
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, init_clip_params
from evr_tpu.parallel import get_mesh
from evr_tpu.training import (
    TrainConfig,
    Trainer,
    make_optimizer,
    make_train_step,
)
from evr_tpu.training.partition import count_labels, param_group_labels


def tiny_cfg():
    return CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=TextConfig(context_length=16, vocab_size=600, width=64, layers=2, heads=4),
    )


def tiny_batch(rng, n):
    tokens = np.zeros((n, 16), np.int32)
    for i in range(n):
        ln = int(rng.integers(3, 10))
        tokens[i, :ln] = rng.integers(1, 500, size=ln)
        tokens[i, ln] = 599  # EOT = max id
    return {
        "images": (rng.random((n, 32, 32, 3)) * 255).astype(np.uint8),
        "tokens": tokens,
        "labels": rng.integers(0, 3, size=n).astype(np.int32),
    }


def _make_params(with_classifier=True):
    cfg = tiny_cfg()
    clip_params = init_clip_params(jax.random.PRNGKey(0), cfg)
    cls = init_classifier_params(
        jax.random.PRNGKey(1), ClassifierConfig(embed_dim=32, num_classes=3)
    ) if with_classifier else None
    return cfg, clip_params, cls


def test_freeze_group_counts():
    cfg, clip_params, cls = _make_params()
    params = {"clip": clip_params, "classifier": cls}
    labels = param_group_labels(params, freeze_layers=8)
    counts = count_labels(labels)
    # 8 frozen tensors per tower (reference freezes first 8 of each)
    assert counts["frozen"] == 16
    assert counts["classifier"] == 4  # fc1/fc2 kernel+bias
    assert counts["visual"] > 0 and counts["text"] > 0 and counts["other"] > 0


def test_frozen_params_do_not_move(rng):
    cfg, clip_params, cls = _make_params()
    params = {"clip": clip_params, "classifier": cls}
    tc = TrainConfig(freeze_layers=8, batch_size=8, epochs=2)
    opt = make_optimizer(tc, params)
    step, _ = make_train_step(cfg, ClassifierConfig(embed_dim=32), tc, opt)

    from evr_tpu.training.finetune import TrainState

    state = TrainState(params=jax.tree.map(jnp.asarray, params), opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))
    before_frozen = np.asarray(state.params["clip"]["visual"]["class_embedding"])
    before_live = np.asarray(state.params["clip"]["text"]["token_embedding"])
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, 8).items()}
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    after_frozen = np.asarray(state.params["clip"]["visual"]["class_embedding"])
    after_live = np.asarray(state.params["clip"]["text"]["token_embedding"])
    np.testing.assert_array_equal(before_frozen, after_frozen)
    assert np.abs(after_live - before_live).max() > 0
    assert np.isfinite(metrics["total_loss"])


def test_frozen_grads_excluded_from_clip_norm(rng):
    """torch parity (VERDICT r4 era bug, fixed round 5): requires_grad=False
    params have NO grads in torch, so they never enter clip_grad_norm_'s
    global norm. The step's grad_norm metric (= what clip_by_global_norm
    sees) must equal the norm over TRAINABLE leaves only."""
    cfg, clip_params, cls = _make_params()
    params = {"clip": clip_params, "classifier": cls}
    tc = TrainConfig(freeze_layers=8, batch_size=8, epochs=2,
                     compute_dtype="float32")
    opt = make_optimizer(tc, params)
    step, _ = make_train_step(cfg, ClassifierConfig(embed_dim=32), tc, opt)
    from evr_tpu.training.finetune import TrainState

    state = TrainState(
        params=jax.tree.map(jnp.asarray, params),
        opt_state=opt.init(params), step=jnp.zeros((), jnp.int32),
    )
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, 8).items()}
    # independent oracle: full unmasked grads, then zero the frozen leaves
    from evr_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD
    from evr_tpu.models.clip import encode_image, encode_text
    from evr_tpu.training.losses import combined_clip_loss
    from evr_tpu.models import classifier_forward

    def raw_loss(p):
        x = batch["images"].astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
        img = encode_image(p["clip"], cfg, x)
        txt = encode_text(p["clip"], cfg, batch["tokens"])
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        logits = classifier_forward(
            p["classifier"], ClassifierConfig(embed_dim=32), img,
            deterministic=False, rng=jax.random.PRNGKey(0),
        )
        return combined_clip_loss(
            img, txt, p["clip"]["logit_scale"], class_logits=logits,
            class_labels=batch["labels"],
        )[0]

    grads = jax.grad(raw_loss)(state.params)
    labels = param_group_labels(params, 8)
    masked = jax.tree.map(
        lambda g, l: jnp.zeros_like(g) if l == "frozen" else g, grads, labels
    )
    import optax

    want = float(optax.global_norm(masked))
    full = float(optax.global_norm(grads))
    assert full > want  # the frozen leaves DO carry nonzero raw grads
    _, metrics = step(state, batch, jax.random.PRNGKey(0))
    got = float(metrics["grad_norm"])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_loss_decreases(rng):
    cfg, clip_params, cls = _make_params()
    params = {"clip": clip_params, "classifier": cls}
    tc = TrainConfig(freeze_layers=0, lr=1e-3, batch_size=8, epochs=10, compute_dtype="float32")
    opt = make_optimizer(tc, params)
    step, _ = make_train_step(cfg, ClassifierConfig(embed_dim=32), tc, opt)
    from evr_tpu.training.finetune import TrainState

    state = TrainState(params=jax.tree.map(jnp.asarray, params), opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, 8).items()}
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0], losses


def test_mesh_step_matches_single_device(rng):
    """One dp step on the 8-device mesh must produce the same params as the
    same global batch on one device (the global-batch InfoNCE guarantee)."""
    cfg, clip_params, cls = _make_params()
    params = {"clip": clip_params, "classifier": cls}
    tc = TrainConfig(freeze_layers=0, lr=1e-4, batch_size=16, compute_dtype="float32")
    batch_np = tiny_batch(rng, 16)

    from evr_tpu.training.finetune import TrainState

    results = []
    for mesh in (None, get_mesh(len(jax.devices()))):
        opt = make_optimizer(tc, params)
        step, _ = make_train_step(cfg, ClassifierConfig(embed_dim=32), tc, opt, mesh=mesh)
        # fresh device copies per run: the train step donates its input state
        fresh = jax.tree.map(lambda a: jnp.asarray(np.array(a)), params)
        state = TrainState(
            params=fresh,
            opt_state=opt.init(fresh),
            step=jnp.zeros((), jnp.int32),
        )
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        results.append((float(metrics["contrastive_loss"]),
                        np.asarray(state.params["clip"]["text"]["token_embedding"])))

    (l1, p1), (l2, p2) = results
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-6)


def test_remat_step_exact(rng):
    """cfg.remat=True (jax.checkpoint per block) must produce bit-equal fp32
    params after a train step — remat trades FLOPs for memory, never math."""
    from evr_tpu.training.finetune import TrainState

    batch_np = tiny_batch(rng, 8)
    results = []
    for remat in (False, True):
        cfg, clip_params, cls = _make_params()
        params = {"clip": clip_params, "classifier": cls}
        tc = TrainConfig(
            freeze_layers=0, lr=1e-4, batch_size=8,
            compute_dtype="float32", remat=remat,
        )
        trainer = Trainer(cfg, clip_params, tc, classifier_params=cls,
                          log_fn=lambda s: None)
        assert trainer.model_cfg.remat is remat
        opt = make_optimizer(tc, params)
        step, _ = make_train_step(
            trainer.model_cfg, ClassifierConfig(embed_dim=32), tc, opt
        )
        fresh = jax.tree.map(lambda a: jnp.asarray(np.array(a)), params)
        state = TrainState(
            params=fresh, opt_state=opt.init(fresh),
            step=jnp.zeros((), jnp.int32),
        )
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        results.append((float(metrics["total_loss"]),
                        np.asarray(state.params["clip"]["visual"]["proj"])))

    (l0, p0), (l1, p1) = results
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    np.testing.assert_allclose(p0, p1, rtol=1e-5, atol=1e-7)


def test_remat_moe_step_exact(rng):
    """remat composes with the MoE towers (run_moe_blocks wraps both the
    dense and sparse block applies in jax.checkpoint)."""
    from evr_tpu.models.moe import MoEConfig
    from evr_tpu.training.finetune import TrainState

    batch_np = tiny_batch(rng, 8)
    moe = MoEConfig(n_experts=2, router_k=2, moe_every=2)
    results = []
    for remat in (False, True):
        cfg, clip_params, cls = _make_params()
        tc = TrainConfig(
            freeze_layers=0, lr=1e-4, batch_size=8,
            compute_dtype="float32", remat=remat, moe=moe,
        )
        trainer = Trainer(cfg, clip_params, tc, classifier_params=cls,
                          log_fn=lambda s: None)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state, metrics = trainer.train_step(
            trainer.state, batch, jax.random.PRNGKey(0)
        )
        results.append(float(metrics["total_loss"]))

    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)


def test_warmup_first_step_is_zero_lr(rng):
    """With warmup, step 0's learning rate is 0 → params identical after the
    first update; without it, the cosine schedule starts at full lr."""
    from evr_tpu.training.finetune import TrainState

    batch_np = tiny_batch(rng, 8)
    for warmup, expect_move in ((0, True), (5, False)):
        cfg, clip_params, cls = _make_params()
        params = {"clip": clip_params, "classifier": cls}
        tc = TrainConfig(
            freeze_layers=0, lr=1e-3, batch_size=8,
            compute_dtype="float32", warmup_steps=warmup,
        )
        opt = make_optimizer(tc, params)
        step, _ = make_train_step(cfg, ClassifierConfig(embed_dim=32), tc, opt)
        fresh = jax.tree.map(lambda a: jnp.asarray(np.array(a)), params)
        state = TrainState(
            params=fresh, opt_state=opt.init(fresh),
            step=jnp.zeros((), jnp.int32),
        )
        before = np.asarray(state.params["clip"]["visual"]["proj"]).copy()
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state, _ = step(state, batch, jax.random.PRNGKey(0))
        after = np.asarray(state.params["clip"]["visual"]["proj"])
        moved = np.abs(after - before).max() > 0
        assert moved is expect_move or bool(moved) == expect_move
        if warmup:
            # by the end of warmup the lr is live again
            for i in range(1, 7):
                state, _ = step(state, batch, jax.random.PRNGKey(i))
            assert np.abs(
                np.asarray(state.params["clip"]["visual"]["proj"]) - before
            ).max() > 0


def test_bf16_adam_moments(rng):
    """adam_mu_dtype='bfloat16' stores the first moment bf16 (half the HBM)
    and training still optimises."""
    cfg, clip_params, cls = _make_params()
    params = {"clip": clip_params, "classifier": cls}
    tc = TrainConfig(
        freeze_layers=0, lr=1e-3, batch_size=8,
        compute_dtype="float32", adam_mu_dtype="bfloat16",
    )
    opt = make_optimizer(tc, params)
    opt_state = opt.init(params)
    mu_dtypes = {
        str(leaf.dtype)
        for leaf in jax.tree.leaves(opt_state)
        if hasattr(leaf, "dtype") and leaf.ndim > 0
    }
    assert "bfloat16" in mu_dtypes  # mu tree stored bf16
    assert "float32" in mu_dtypes  # nu tree stays fp32

    from evr_tpu.training.finetune import TrainState

    step, _ = make_train_step(cfg, ClassifierConfig(embed_dim=32), tc, opt)
    state = TrainState(
        params=jax.tree.map(jnp.asarray, params), opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, 8).items()}
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0]


def test_ema_math_and_checkpoint_roundtrip(rng, tmp_path):
    """EMA follows ema' = d*ema + (1-d)*params after every step, survives a
    checkpoint round trip, and stays None when disabled."""
    cfg, clip_params, cls = _make_params()
    tc = TrainConfig(
        freeze_layers=0, lr=1e-3, batch_size=8, compute_dtype="float32",
        ema_decay=0.9, save_dir=str(tmp_path / "ckpt"),
    )
    trainer = Trainer(cfg, clip_params, tc, classifier_params=cls,
                      log_fn=lambda s: None)
    p0 = jax.tree.map(np.asarray, trainer.state.params)
    e0 = jax.tree.map(np.asarray, trainer.state.ema_params)
    np.testing.assert_array_equal(
        p0["clip"]["visual"]["proj"], e0["clip"]["visual"]["proj"]
    )

    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, 8).items()}
    trainer.state, _ = trainer.train_step(trainer.state, batch, jax.random.PRNGKey(0))
    p1 = np.asarray(trainer.state.params["clip"]["visual"]["proj"])
    e1 = np.asarray(trainer.state.ema_params["clip"]["visual"]["proj"])
    expect = 0.9 * e0["clip"]["visual"]["proj"] + 0.1 * p1
    np.testing.assert_allclose(e1, expect, rtol=1e-6, atol=1e-7)
    assert np.abs(e1 - p1).max() > 0  # EMA lags the raw params

    trainer.save_checkpoint("ema_test", epoch=0, metrics={"x": 1.0})
    trainer2 = Trainer(cfg, clip_params, tc, classifier_params=cls,
                       log_fn=lambda s: None)
    payload = trainer2.restore_checkpoint("ema_test")
    assert "ema" in payload
    np.testing.assert_allclose(
        np.asarray(trainer2.state.ema_params["clip"]["visual"]["proj"]),
        e1, rtol=1e-7,
    )

    # serving the averaged weights: prefer_ema picks payload["ema"]
    from evr_tpu.index.engine import load_orbax_checkpoint

    ckpt = str(tmp_path / "ckpt" / "ema_test")
    raw = load_orbax_checkpoint(ckpt)
    avg = load_orbax_checkpoint(ckpt, prefer_ema=True)
    np.testing.assert_allclose(
        np.asarray(avg["clip"]["visual"]["proj"]), e1, rtol=1e-7
    )
    assert np.abs(
        np.asarray(raw["clip"]["visual"]["proj"])
        - np.asarray(avg["clip"]["visual"]["proj"])
    ).max() > 0

    # disabled → no EMA tree anywhere
    tc_off = TrainConfig(freeze_layers=0, batch_size=8, compute_dtype="float32")
    t_off = Trainer(cfg, clip_params, tc_off, classifier_params=cls,
                    log_fn=lambda s: None)
    assert t_off.state.ema_params is None
    st, _ = t_off.train_step(t_off.state, batch, jax.random.PRNGKey(0))
    assert st.ema_params is None


def test_ema_fsdp_exact_vs_single_device(rng):
    """EMA under fsdp (sharded ema tree) matches the single-device EMA."""
    mesh = get_mesh(len(jax.devices()))
    batch_np = tiny_batch(rng, 8)
    results = []
    for use_fsdp, mesh_arg in ((False, None), (True, mesh)):
        cfg, clip_params, cls = _make_params()
        tc = TrainConfig(
            freeze_layers=0, lr=1e-3, batch_size=8,
            compute_dtype="float32", ema_decay=0.95,
        )
        trainer = Trainer(cfg, clip_params, tc, classifier_params=cls,
                          mesh=mesh_arg, fsdp=use_fsdp, log_fn=lambda s: None)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        trainer.state, _ = trainer.train_step(
            trainer.state, batch, jax.random.PRNGKey(0)
        )
        results.append(
            np.asarray(
                jax.device_get(trainer.state.ema_params["clip"]["visual"]["proj"])
            )
        )
    np.testing.assert_allclose(results[0], results[1], rtol=1e-5, atol=1e-7)


def test_training_options_compose(rng, tmp_path):
    """Kitchen-sink composition guard: remat + EMA + warmup + bf16 moments +
    patch-drop + grad-accumulation all enabled in ONE Trainer — the step
    runs, optimises, autosaves and round-trips."""
    cfg, clip_params, cls = _make_params()
    tc = TrainConfig(
        freeze_layers=0, lr=1e-3, batch_size=8, epochs=1,
        compute_dtype="float32",
        remat=True, ema_decay=0.9, warmup_steps=1,
        adam_mu_dtype="bfloat16", patch_drop=0.25,
        grad_accumulation_steps=2,
        save_dir=str(tmp_path / "ckpt"),
    )
    trainer = Trainer(cfg, clip_params, tc, classifier_params=cls,
                      log_fn=lambda s: None)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, 8).items()}
    # per-step train losses are noisy under patch-drop; judge optimisation
    # by the deterministic eval loss (full sequence, no masking)
    before = float(trainer.eval_step(trainer.state, batch)["total_loss"])
    for i in range(8):
        trainer.state, metrics = trainer.train_step(
            trainer.state, batch, jax.random.PRNGKey(i)
        )
        assert np.isfinite(float(metrics["total_loss"]))
    after = float(trainer.eval_step(trainer.state, batch)["total_loss"])
    assert after < before
    assert trainer.state.ema_params is not None

    trainer.save_checkpoint("combo", epoch=0, metrics={})
    trainer2 = Trainer(cfg, clip_params, tc, classifier_params=cls,
                       log_fn=lambda s: None)
    trainer2.restore_checkpoint("combo")
    assert trainer2.state.ema_params is not None
    trainer2.state, m = trainer2.train_step(
        trainer2.state, batch, jax.random.PRNGKey(99)
    )
    assert np.isfinite(float(m["total_loss"]))


def test_trainer_fit_and_checkpoint(rng, tmp_path):
    cfg, clip_params, cls = _make_params()
    tc = TrainConfig(
        freeze_layers=0, lr=1e-4, batch_size=8, epochs=2,
        compute_dtype="float32", save_dir=str(tmp_path / "ckpt"),
    )
    trainer = Trainer(cfg, clip_params, tc, classifier_params=cls, log_fn=lambda s: None)
    batches = [tiny_batch(rng, 8) for _ in range(2)]
    result = trainer.fit(lambda e: iter(batches), lambda e: iter(batches[:1]))
    assert len(result["history"]) == 2
    assert (tmp_path / "ckpt" / "final_checkpoint").exists()

    # roundtrip restore
    before = np.asarray(trainer.state.params["clip"]["logit_scale"])
    payload = trainer.restore_checkpoint("final_checkpoint")
    after = np.asarray(trainer.state.params["clip"]["logit_scale"])
    np.testing.assert_allclose(before, after)
    assert "epoch" in payload
