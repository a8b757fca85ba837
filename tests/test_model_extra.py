"""Model extras: GELU-variant parity, registry shapes, resolution
adaptation, config round-trip."""

import dataclasses
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evr_tpu.models import MODEL_REGISTRY, get_model_config, init_clip_params
from evr_tpu.models import clip as jclip
from evr_tpu.models.adapt import adapt_params_for_resolution


def test_registry_contains_reference_zoo():
    assert set(MODEL_REGISTRY) >= {
        "ViT-B/32",
        "ViT-B/16",
        "ViT-L/14",
        "ViT-L/14@336px",
        "ViT-H-14",
    }
    assert MODEL_REGISTRY["ViT-H-14"].activation == "gelu"
    assert MODEL_REGISTRY["ViT-L/14@336px"].vision.seq_len == 24 * 24 + 1


def test_gelu_variant_parity_vs_hf():
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel as HFCLIPModel

    from evr_tpu.models.torch_import import from_hf_state_dict

    hf_cfg = HFCLIPConfig(
        projection_dim=32,
        text_config={
            "hidden_size": 64, "intermediate_size": 256, "num_hidden_layers": 2,
            "num_attention_heads": 4, "max_position_embeddings": 16,
            "vocab_size": 1000, "hidden_act": "gelu", "eos_token_id": 999,
        },
        vision_config={
            "hidden_size": 64, "intermediate_size": 256, "num_hidden_layers": 2,
            "num_attention_heads": 4, "image_size": 32, "patch_size": 8,
            "hidden_act": "gelu",
        },
    )
    torch.manual_seed(0)
    model = HFCLIPModel(hf_cfg).eval()
    cfg = jclip.CLIPConfig(
        embed_dim=32,
        vision=jclip.VisionConfig(32, 8, 64, 2, 4),
        text=jclip.TextConfig(16, 1000, 64, 2, 4),
        activation="gelu",
    )
    params = from_hf_state_dict(model.state_dict(), cfg)
    pixels = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    ours = np.asarray(jclip.encode_image(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_resolution_adaptation():
    small = jclip.CLIPConfig(
        embed_dim=16,
        vision=jclip.VisionConfig(image_size=32, patch_size=8, width=32, layers=1, heads=2),
        text=jclip.TextConfig(16, 100, 32, 1, 2),
    )
    big = dataclasses.replace(
        small, vision=dataclasses.replace(small.vision, image_size=64)
    )
    params = init_clip_params(jax.random.PRNGKey(0), small)
    adapted = adapt_params_for_resolution(params, big)
    assert adapted["visual"]["pos_embedding"].shape == (big.vision.seq_len, 32)
    # the adapted checkpoint runs at the new resolution
    pixels = jnp.zeros((1, 64, 64, 3))
    out = jclip.encode_image(adapted, big, pixels)
    assert out.shape == (1, 16)
    # no-op when already matching
    again = adapt_params_for_resolution(adapted, big)
    assert again["visual"]["pos_embedding"] is adapted["visual"]["pos_embedding"]


def test_config_json_roundtrip(tmp_path):
    from evr_tpu import config as cfgmod

    @dataclasses.dataclass
    class Inner:
        x: int = 1

    @dataclasses.dataclass
    class Outer:
        name: str = "a"
        inner: Inner = dataclasses.field(default_factory=Inner)
        values: list = dataclasses.field(default_factory=lambda: [1, 2])

    o = Outer(name="b", inner=Inner(x=5))
    path = tmp_path / "cfg.json"
    cfgmod.save_json(o, path)
    loaded = cfgmod.load_json(Outer, path)
    assert loaded.name == "b" and loaded.inner.x == 5 and loaded.values == [1, 2]
    with pytest.raises(KeyError):
        cfgmod.from_dict(Outer, {"nope": 1})


def test_encode_staged_u8_matches_normalise_then_encode():
    """Folded-stem serving path (uint8 unfold + normalisation baked into the
    patch GEMM) is numerically equivalent to (x/255-mean)/std → encode_image."""
    import jax
    import jax.numpy as jnp

    from evr_tpu.models.clip import (
        CLIPConfig,
        TextConfig,
        VisionConfig,
        encode_image,
        encode_staged_u8,
        init_clip_params,
    )
    from evr_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD

    cfg = CLIPConfig(
        embed_dim=64,
        vision=VisionConfig(image_size=64, patch_size=16, width=128, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    u8 = (rng.random((3, 64, 64, 3)) * 255).astype(np.uint8)
    x = u8.astype(np.float32) / 255.0
    x = (x - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)

    ref = np.asarray(encode_image(params, cfg, jnp.asarray(x), dtype=jnp.float32))
    got = np.asarray(encode_staged_u8(params, cfg, jnp.asarray(u8), dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5 * np.abs(ref).max())

    # bf16 path tracks the fp32 reference closely enough for retrieval
    got16 = np.asarray(encode_staged_u8(params, cfg, jnp.asarray(u8), dtype=jnp.bfloat16))
    n = lambda a: a / np.linalg.norm(a, axis=-1, keepdims=True)
    assert (n(got16) * n(ref)).sum(-1).min() > 0.99

    # wrong staging resolution is rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="staged batch"):
        encode_staged_u8(params, cfg, jnp.asarray(u8[:, :32]), dtype=jnp.float32)
