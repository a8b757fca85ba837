"""Multi-slice mesh layout: hierarchical (replica × data) training step
matches single-device numerics (replica axis = DCN, data axis = ICI)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from evr_tpu.models import ClassifierConfig, init_classifier_params
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, init_clip_params
from evr_tpu.parallel.mesh import get_multislice_mesh
from evr_tpu.training import TrainConfig, make_optimizer, make_train_step
from evr_tpu.training.finetune import TrainState


def test_multislice_mesh_shapes():
    mesh = get_multislice_mesh(2, 4)
    assert mesh.shape == {"replica": 2, "data": 4}
    with pytest.raises(ValueError):
        get_multislice_mesh(4, 4)


def test_multislice_training_step(rng):
    """Batch sharded over BOTH axes (replica outer, data inner) still yields
    the single-device global-batch loss."""
    mesh = get_multislice_mesh(2, 4)
    cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(32, 8, 64, 2, 4),
        text=TextConfig(16, 600, 64, 2, 4),
    )
    params = {
        "clip": init_clip_params(jax.random.PRNGKey(0), cfg),
        "classifier": init_classifier_params(jax.random.PRNGKey(1), ClassifierConfig(embed_dim=32)),
    }
    tc = TrainConfig(freeze_layers=0, lr=1e-4, compute_dtype="float32")
    tokens = np.zeros((16, 16), np.int32)
    tokens[:, 0] = 1
    tokens[:, 1] = 599
    batch_np = {
        "images": (rng.random((16, 32, 32, 3)) * 255).astype(np.uint8),
        "tokens": tokens,
        "labels": rng.integers(0, 3, size=16).astype(np.int32),
    }

    # single-device reference
    opt = make_optimizer(tc, params)
    step, _ = make_train_step(cfg, ClassifierConfig(embed_dim=32), tc, opt)
    fresh = jax.tree.map(lambda a: jnp.asarray(np.array(a)), params)
    state = TrainState(params=fresh, opt_state=opt.init(fresh), step=jnp.zeros((), jnp.int32))
    _, ref = step(state, {k: jnp.asarray(v) for k, v in batch_np.items()}, jax.random.PRNGKey(0))

    # hierarchical: batch rows sharded over replica×data jointly
    opt2 = make_optimizer(tc, params)
    step2, _ = make_train_step(cfg, ClassifierConfig(embed_dim=32), tc, opt2)
    fresh2 = jax.tree.map(lambda a: jnp.asarray(np.array(a)), params)
    state2 = TrainState(params=fresh2, opt_state=opt2.init(fresh2), step=jnp.zeros((), jnp.int32))
    sh = NamedSharding(mesh, P(("replica", "data")))
    batch = {k: jax.device_put(v, sh) for k, v in batch_np.items()}
    _, multi = step2(state2, batch, jax.random.PRNGKey(0))

    np.testing.assert_allclose(
        float(ref["contrastive_loss"]), float(multi["contrastive_loss"]), rtol=1e-5
    )
