"""Torch checkpoint export: lossless round-trip through torch_import and
numerics preservation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evr_tpu.models import ClassifierConfig, init_classifier_params, init_clip_params
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, encode_image
from evr_tpu.models.torch_export import save_reference_checkpoint, to_openai_state_dict
from evr_tpu.models.torch_import import (
    config_from_openai_state_dict,
    from_openai_state_dict,
    load_checkpoint,
)

torch = pytest.importorskip("torch")


def _cfg():
    return CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=1),
        text=TextConfig(context_length=16, vocab_size=128, width=64, layers=2, heads=1),
    )


def test_state_dict_roundtrip(rng):
    cfg = _cfg()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    sd = to_openai_state_dict(params)
    back = from_openai_state_dict(sd, cfg)

    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # shape inference reproduces the config
    inferred = config_from_openai_state_dict(sd)
    assert inferred.vision.patch_size == 8
    assert inferred.text.vocab_size == 128
    assert inferred.embed_dim == 32


def test_full_checkpoint_file_roundtrip(rng, tmp_path):
    cfg = _cfg()
    params = init_clip_params(jax.random.PRNGKey(1), cfg)
    cls = init_classifier_params(
        jax.random.PRNGKey(2), ClassifierConfig(embed_dim=32, num_classes=3)
    )
    path = tmp_path / "export.pt"
    save_reference_checkpoint(path, params, cls, epoch=7, metrics={"loss": 1.5})

    blob = load_checkpoint(str(path))
    assert blob["meta"]["epoch"] == 7
    pixels = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    out_orig = np.asarray(encode_image(params, cfg, pixels))
    out_back = np.asarray(encode_image(blob["clip"], cfg, pixels))
    np.testing.assert_allclose(out_orig, out_back, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cls["fc1"]["kernel"]),
        np.asarray(blob["classifier"]["fc1"]["kernel"]),
        rtol=1e-6,
    )
