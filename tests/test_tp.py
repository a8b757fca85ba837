"""Tensor-parallel sharding: a dp×tp train step on a 2-D mesh must match
single-device numerics (GSPMD inserts the collectives)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from evr_tpu.models import ClassifierConfig, init_classifier_params
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, init_clip_params
from evr_tpu.parallel import get_mesh
from evr_tpu.parallel.tp import clip_param_shardings
from evr_tpu.training import TrainConfig, make_optimizer, make_train_step
from evr_tpu.training.finetune import TrainState


def _cfg():
    return CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=TextConfig(context_length=16, vocab_size=600, width=64, layers=2, heads=4),
    )


def _batch(rng, n):
    tokens = np.zeros((n, 16), np.int32)
    tokens[:, 0] = 1
    tokens[:, 1] = 599
    return {
        "images": (rng.random((n, 32, 32, 3)) * 255).astype(np.uint8),
        "tokens": tokens,
        "labels": rng.integers(0, 3, size=n).astype(np.int32),
    }


def test_tp_sharded_step_matches_single(rng):
    n_dev = len(jax.devices())
    mesh = get_mesh(n_dev, axis_names=("data", "model"), shape=(n_dev // 2, 2))

    cfg = _cfg()
    params = {
        "clip": init_clip_params(jax.random.PRNGKey(0), cfg),
        "classifier": init_classifier_params(
            jax.random.PRNGKey(1), ClassifierConfig(embed_dim=32)
        ),
    }
    tc = TrainConfig(freeze_layers=0, lr=1e-4, compute_dtype="float32")
    batch_np = _batch(rng, 8)

    # single-device reference
    opt = make_optimizer(tc, params)
    step, _ = make_train_step(cfg, ClassifierConfig(embed_dim=32), tc, opt)
    fresh = jax.tree.map(lambda a: jnp.asarray(np.array(a)), params)
    state = TrainState(params=fresh, opt_state=opt.init(fresh), step=jnp.zeros((), jnp.int32))
    state, ref_metrics = step(state, {k: jnp.asarray(v) for k, v in batch_np.items()}, jax.random.PRNGKey(0))
    ref_param = np.asarray(state.params["clip"]["visual"]["blocks"][0]["mlp"]["fc"]["kernel"])

    # dp×tp: params committed with Megatron shardings, batch sharded on data
    shardings = clip_param_shardings(mesh, params)
    params_tp = jax.tree.map(
        lambda a, s: jax.device_put(np.array(a), s), params, shardings
    )
    opt2 = make_optimizer(tc, params)
    step2, _ = make_train_step(cfg, ClassifierConfig(embed_dim=32), tc, opt2)
    state2 = TrainState(
        params=params_tp, opt_state=opt2.init(params_tp), step=jnp.zeros((), jnp.int32)
    )
    data_sh = NamedSharding(mesh, P("data"))
    batch = {k: jax.device_put(v, data_sh) for k, v in batch_np.items()}
    state2, tp_metrics = step2(state2, batch, jax.random.PRNGKey(0))
    tp_param = np.asarray(state2.params["clip"]["visual"]["blocks"][0]["mlp"]["fc"]["kernel"])

    np.testing.assert_allclose(
        float(ref_metrics["contrastive_loss"]),
        float(tp_metrics["contrastive_loss"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(ref_param, tp_param, rtol=1e-4, atol=1e-6)
    # the fc kernel really is sharded over the model axis
    sh = state2.params["clip"]["visual"]["blocks"][0]["mlp"]["fc"]["kernel"].sharding
    assert sh.spec == P(None, "model")
