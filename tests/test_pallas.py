"""Pallas kernels vs XLA reference numerics (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evr_tpu.ops.attention import flash_attention
from evr_tpu.ops.layernorm import fused_layer_norm


def _xla_attention(q, k, v, causal):
    import math

    B, H, T, d = q.shape
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if causal:
        mask = jnp.tril(jnp.ones((T, T), bool))
        logits = jnp.where(mask, logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize("T,causal", [(50, False), (77, True), (197, False), (13, True)])
def test_flash_attention_matches_xla(rng, T, causal):
    B, H, d = 2, 4, 64
    q = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    ours = np.asarray(flash_attention(q, k, v, causal=causal))
    ref = np.asarray(_xla_attention(q, k, v, causal))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_flash_attention_in_model(rng):
    """attn_impl='flash' through the full tower matches the XLA tower."""
    import dataclasses

    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, encode_image, init_clip_params

    cfg = CLIPConfig(
        embed_dim=16,
        vision=VisionConfig(image_size=32, patch_size=8, width=128, layers=2, heads=2),
        text=TextConfig(context_length=16, vocab_size=100, width=128, layers=2, heads=2),
    )
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    pixels = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    xla_out = np.asarray(encode_image(params, cfg, pixels))
    flash_cfg = dataclasses.replace(cfg, attn_impl="flash")
    flash_out = np.asarray(encode_image(params, flash_cfg, pixels))
    np.testing.assert_allclose(flash_out, xla_out, rtol=2e-4, atol=2e-4)


def test_fused_layer_norm(rng):
    x = jnp.asarray(rng.normal(size=(6, 50, 96)).astype(np.float32) * 3 + 1)
    scale = jnp.asarray(rng.normal(size=96).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=96).astype(np.float32))
    ours = np.asarray(fused_layer_norm(x, scale, bias))
    x32 = np.asarray(x, np.float64)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    ref = (x32 - mean) / np.sqrt(var + 1e-5) * np.asarray(scale) + np.asarray(bias)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_fused_layer_norm_quickgelu(rng):
    x = jnp.asarray(rng.normal(size=(4, 96)).astype(np.float32))
    scale = jnp.ones(96, jnp.float32)
    bias = jnp.zeros(96, jnp.float32)
    ours = np.asarray(fused_layer_norm(x, scale, bias, activation="quick_gelu"))
    x32 = np.asarray(x, np.float64)
    ln = (x32 - x32.mean(-1, keepdims=True)) / np.sqrt(x32.var(-1, keepdims=True) + 1e-5)
    ref = ln * (1 / (1 + np.exp(-1.702 * ln)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
