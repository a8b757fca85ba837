"""SigLIP fine-tuning (`training/siglip_train.py`): descent, dp-mesh
exactness vs single device (the repo's bar for every training path), and
that BOTH towers + the sigmoid parameters move."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evr_tpu.models.siglip import (
    SiglipConfig,
    SiglipTextConfig,
    SiglipVisionConfig,
    init_siglip_params,
)
from evr_tpu.parallel import get_mesh
from evr_tpu.training.siglip_train import (
    SiglipTrainConfig,
    fit_siglip,
    make_siglip_optimizer,
    make_siglip_train_step,
)


def _tiny_cfg():
    return SiglipConfig(
        vision=SiglipVisionConfig(image_size=32, patch_size=16, width=32,
                                  layers=1, heads=2, mlp_dim=64),
        text=SiglipTextConfig(context_length=8, vocab_size=60, width=32,
                              layers=1, heads=2, mlp_dim=64),
    )


def _batch(rng, n=8):
    return {
        "images": (rng.random((n, 32, 32, 3)) * 255).astype(np.uint8),
        "tokens": rng.integers(1, 60, size=(n, 8)).astype(np.int32),
    }


def test_siglip_fit_descends_and_moves_both_towers():
    cfg = _tiny_cfg()
    params = init_siglip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    trained, losses = fit_siglip(
        params, cfg, [batch] * 10, SiglipTrainConfig(lr=3e-4),
    )
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # both towers and the sigmoid parameters moved
    assert not np.allclose(
        np.asarray(trained["visual"]["blocks"][0]["mlp"]["fc"]["kernel"]),
        np.asarray(params["visual"]["blocks"][0]["mlp"]["fc"]["kernel"]),
    )
    assert not np.allclose(
        np.asarray(trained["text"]["blocks"][0]["mlp"]["fc"]["kernel"]),
        np.asarray(params["text"]["blocks"][0]["mlp"]["fc"]["kernel"]),
    )
    assert float(trained["logit_bias"]) != -10.0


def test_siglip_mesh_step_matches_single_device():
    """One dp step on the 8-device mesh == the same global batch on one
    device (sigmoid loss has no softmax; collectives must be exact)."""
    cfg = _tiny_cfg()
    params = init_siglip_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    batch = _batch(rng, n=16)

    results = []
    for mesh in (None, get_mesh(len(jax.devices()))):
        trained, losses = fit_siglip(
            params, cfg, [batch], SiglipTrainConfig(lr=1e-4), mesh=mesh,
        )
        results.append((losses[0], trained))
    (l1, p1), (l2, p2) = results
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_siglip_optimizer_clips():
    tc = SiglipTrainConfig(grad_clip=0.5)
    opt = make_siglip_optimizer(tc)
    params = {"w": jnp.zeros((4, 4))}
    state = opt.init(params)
    huge = {"w": jnp.full((4, 4), 1e6)}
    updates, _ = opt.update(huge, state, params)
    # clipped global norm -> finite, small update
    assert float(jnp.linalg.norm(updates["w"])) < 1.0
