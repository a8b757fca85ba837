"""Golden-numerics parity: evr_tpu CLIP vs HuggingFace torch CLIPModel.

A small random-initialised HF CLIPModel (quick_gelu) is converted through
``evr_tpu.models.torch_import.from_hf_state_dict`` and both implementations
are run on identical inputs. This is the fp32-tolerance gate SURVEY.md §7
requires before any retrieval-parity claim.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from evr_tpu.models import clip as jclip
from evr_tpu.models.torch_import import from_hf_state_dict

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_hf_model():
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel as HFCLIPModel

    cfg = HFCLIPConfig(
        projection_dim=32,
        text_config={
            "hidden_size": 64,
            "intermediate_size": 256,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "max_position_embeddings": 16,
            "vocab_size": 1000,
            "hidden_act": "quick_gelu",
            "eos_token_id": 999,
            "bos_token_id": 998,
            "pad_token_id": 0,
        },
        vision_config={
            "hidden_size": 64,
            "intermediate_size": 256,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "image_size": 32,
            "patch_size": 8,
            "hidden_act": "quick_gelu",
        },
    )
    torch.manual_seed(0)
    model = HFCLIPModel(cfg).eval()
    return model


def _tiny_jax_config():
    return jclip.CLIPConfig(
        embed_dim=32,
        vision=jclip.VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=jclip.TextConfig(context_length=16, vocab_size=1000, width=64, layers=2, heads=4),
    )


@pytest.fixture(scope="module")
def parity_pair():
    model = _tiny_hf_model()
    cfg = _tiny_jax_config()
    params = from_hf_state_dict(model.state_dict(), cfg)
    return model, cfg, params


def test_image_tower_parity(parity_pair):
    model, cfg, params = parity_pair
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()

    ours = np.asarray(jclip.encode_image(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_text_tower_parity(parity_pair):
    model, cfg, params = parity_pair
    rng = np.random.default_rng(1)
    # tokens: ids < 990, one EOS (999 = max id) per row, zero padding after
    tokens = np.zeros((4, 16), dtype=np.int64)
    for i in range(4):
        n = int(rng.integers(3, 12))
        tokens[i, 0] = 998
        tokens[i, 1 : 1 + n] = rng.integers(1, 990, size=n)
        tokens[i, 1 + n] = 999

    with torch.no_grad():
        ref = model.get_text_features(input_ids=torch.from_numpy(tokens)).numpy()

    ours = np.asarray(jclip.encode_text(params, cfg, jnp.asarray(tokens.astype(np.int32))))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_joint_forward_logits(parity_pair):
    model, cfg, params = parity_pair
    rng = np.random.default_rng(2)
    pixels = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    tokens = np.zeros((2, 16), dtype=np.int64)
    tokens[:, 0] = 998
    tokens[0, 1:5] = [5, 6, 7, 999]
    tokens[1, 1:4] = [8, 9, 999]

    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(tokens),
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
        )
    out = jclip.clip_forward(
        params, cfg, jnp.asarray(pixels), jnp.asarray(tokens.astype(np.int32))
    )
    np.testing.assert_allclose(
        np.asarray(out["logits_per_image"]),
        ref.logits_per_image.numpy(),
        rtol=1e-4,
        atol=1e-4,
    )


def test_bf16_close_to_fp32(parity_pair):
    """bf16 compute path must track fp32 closely enough for retrieval."""
    _, cfg, params = parity_pair
    rng = np.random.default_rng(3)
    pixels = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    f32 = np.asarray(jclip.encode_image(params, cfg, pixels, dtype=jnp.float32))
    bf16 = np.asarray(jclip.encode_image(params, cfg, pixels, dtype=jnp.bfloat16))

    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    cos = (norm(f32) * norm(bf16)).sum(-1)
    assert (cos > 0.99).all()
