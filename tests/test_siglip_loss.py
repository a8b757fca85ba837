"""SigLIP pairwise sigmoid contrastive loss (arxiv 2303.15343).

TPU-idiomatic alternative to InfoNCE: no softmax over the global batch, so
the distributed version needs only a feature all-gather and is exactly equal
to single-device math at the same global batch — both pinned here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evr_tpu.parallel.contrastive import global_siglip_loss, siglip_loss_single


def _unit_rows(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_siglip_prefers_aligned_pairs():
    rng = np.random.default_rng(0)
    img = _unit_rows(rng, 16, 32)
    scale = jnp.asarray(np.log(10.0), jnp.float32)
    bias = jnp.float32(-10.0)
    aligned = float(siglip_loss_single(jnp.asarray(img), jnp.asarray(img), scale, bias))
    shuffled = float(
        siglip_loss_single(
            jnp.asarray(img), jnp.asarray(np.roll(img, 3, axis=0)), scale, bias
        )
    )
    assert aligned < shuffled


def test_siglip_bias_and_scale_gradients_flow():
    rng = np.random.default_rng(1)
    img = jnp.asarray(_unit_rows(rng, 8, 16))
    txt = jnp.asarray(_unit_rows(rng, 8, 16))

    def loss(scale, bias):
        return siglip_loss_single(img, txt, scale, bias)

    gs, gb = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(np.log(10.0), jnp.float32), jnp.float32(-10.0)
    )
    assert np.isfinite(float(gs)) and np.isfinite(float(gb))
    assert float(gb) != 0.0


def test_global_siglip_equals_single_device():
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devices = jax.devices()
    assert len(devices) == 8
    mesh = Mesh(np.asarray(devices), ("data",))
    rng = np.random.default_rng(2)
    B, D = 32, 16  # 4 per device
    img = _unit_rows(rng, B, D)
    txt = _unit_rows(rng, B, D)
    scale = jnp.asarray(np.log(10.0), jnp.float32)
    bias = jnp.float32(-10.0)

    single = float(siglip_loss_single(jnp.asarray(img), jnp.asarray(txt), scale, bias))

    fn = shard_map(
        lambda i, t, s, b: global_siglip_loss(i, t, s, b, "data"),
        mesh=mesh,
        in_specs=(P("data", None), P("data", None), P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    dist = float(fn(jnp.asarray(img), jnp.asarray(txt), scale, bias))
    assert dist == pytest.approx(single, rel=1e-6)


def test_train_step_siglip_updates_logit_bias():
    from evr_tpu.models import clip as jclip
    from evr_tpu.training import TrainConfig, Trainer

    cfg = jclip.CLIPConfig(
        embed_dim=32,
        vision=jclip.VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=jclip.TextConfig(context_length=16, vocab_size=512, width=64, layers=2, heads=4),
    )
    clip_params = jclip.init_clip_params(jax.random.PRNGKey(0), cfg)
    tc = TrainConfig(
        freeze_layers=0, batch_size=4, epochs=1, compute_dtype="float32",
        contrastive_loss="siglip", save_dir="/tmp/siglip_test_ckpt",
    )
    trainer = Trainer(cfg, clip_params, tc)
    assert "logit_bias" in trainer.state.params["clip"]
    assert float(trainer.state.params["clip"]["logit_bias"]) == -10.0

    rng = np.random.default_rng(3)
    tokens = np.zeros((4, 16), np.int32)
    tokens[:, 0] = 1
    tokens[:, 1] = 511
    batch = {
        "images": jnp.asarray((rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)),
        "tokens": jnp.asarray(tokens),
        "labels": jnp.asarray(rng.integers(0, 3, size=4).astype(np.int32)),
    }
    state, metrics = trainer.train_step(trainer.state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(state.params["clip"]["logit_bias"]) != -10.0  # bias is learnable
