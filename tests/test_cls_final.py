"""Pooled-row-specialized final blocks (`layers.final_block_cls` / `_eot`).

CLIP's vision pooling reads only ``x[:, 0]`` of the last block's output,
and text pooling reads one argmax-EOT row per sequence (the pip ``clip``
model behind `/root/reference/Backend/services/embedding_service.py:151-217`),
so the serving encode paths (`encode_staged_u8`, `encode_text` with
``eot_fast_final``) run the final block on the pooled row alone:
K/V over all tokens, Q/attention/out-proj/MLP on the one surviving row.
These tests pin that the fast paths are numerically the full block's
pooled row for fp32/bf16 and for int8-quantized params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evr_tpu.models.clip import (
    CLIPConfig,
    TextConfig,
    VisionConfig,
    encode_staged_u8,
    encode_text,
    init_clip_params,
)
from evr_tpu.models.layers import block_apply, final_block_cls, final_block_eot
from evr_tpu.models.quant import quantize_clip_params


@pytest.fixture(scope="module")
def small():
    cfg = CLIPConfig(
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=3, heads=4),
        text=TextConfig(width=32, layers=2, heads=2),
        embed_dim=16,
    )
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_block_level_matches_full_block(small):
    _, params = small
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 64))
    bp = params["visual"]["blocks"][-1]
    full = block_apply(x, bp, 4, False, "xla", "quick_gelu")[:, 0]
    fast = final_block_cls(x, bp, 4, "quick_gelu")
    np.testing.assert_allclose(np.asarray(full), np.asarray(fast), atol=1e-5)


def test_block_level_exact_gelu(small):
    _, params = small
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 10, 64))
    bp = params["visual"]["blocks"][0]
    full = block_apply(x, bp, 4, False, "xla", "gelu")[:, 0]
    fast = final_block_cls(x, bp, 4, "gelu")
    np.testing.assert_allclose(np.asarray(full), np.asarray(fast), atol=1e-5)


def test_staged_encode_fast_final_matches(small):
    cfg, params = small
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8))
    ref = encode_staged_u8(params, cfg, u8, cls_fast_final=False)
    fast = encode_staged_u8(params, cfg, u8, cls_fast_final=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fast), atol=1e-5)


def test_staged_encode_bf16_cosine(small):
    cfg, params = small
    rng = np.random.default_rng(1)
    u8 = jnp.asarray(rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8))
    ref = encode_staged_u8(params, cfg, u8, dtype=jnp.bfloat16, cls_fast_final=False)
    fast = encode_staged_u8(params, cfg, u8, dtype=jnp.bfloat16, cls_fast_final=True)
    a = np.asarray(ref, np.float32)
    b = np.asarray(fast, np.float32)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert cos.min() > 0.9999


def test_int8_quantized_params(small):
    cfg, params = small
    qp = quantize_clip_params(params)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 10, 64))
    bp = qp["visual"]["blocks"][-1]
    full = block_apply(x, bp, 4, False, "xla", "quick_gelu")[:, 0]
    fast = final_block_cls(x, bp, 4, "quick_gelu")
    np.testing.assert_allclose(np.asarray(full), np.asarray(fast), atol=1e-5)

    rng = np.random.default_rng(2)
    u8 = jnp.asarray(rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8))
    ref = encode_staged_u8(qp, cfg, u8, cls_fast_final=False)
    fast = encode_staged_u8(qp, cfg, u8, cls_fast_final=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fast), atol=1e-5)


def _rand_tokens(rng, B, T, vocab=512):
    """Token rows with an argmax-EOT at a distinct position per row."""
    toks = rng.integers(1, vocab - 1, (B, T)).astype(np.int32)
    for b in range(B):
        toks[b, rng.integers(1, T)] = vocab - 1  # EOT = largest id
    return jnp.asarray(toks)


def test_eot_block_level_matches_full_block(small):
    _, params = small
    x = jax.random.normal(jax.random.PRNGKey(4), (5, 12, 32))
    bp = params["text"]["blocks"][-1]
    eot = jnp.asarray([0, 3, 7, 11, 5])
    full = block_apply(x, bp, 2, True, "xla", "quick_gelu")
    full = jnp.take_along_axis(full, eot[:, None, None], axis=1)[:, 0]
    fast = final_block_eot(x, bp, 2, eot, "quick_gelu")
    np.testing.assert_allclose(np.asarray(full), np.asarray(fast), atol=1e-5)


def test_encode_text_fast_final_matches(small):
    cfg, params = small
    toks = _rand_tokens(np.random.default_rng(4), 6, cfg.text.context_length)
    ref = encode_text(params, cfg, toks, eot_fast_final=False)
    fast = encode_text(params, cfg, toks, eot_fast_final=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fast), atol=1e-5)


def test_encode_text_fast_final_int8(small):
    cfg, params = small
    qp = quantize_clip_params(params)
    toks = _rand_tokens(np.random.default_rng(5), 4, cfg.text.context_length)
    ref = encode_text(qp, cfg, toks, eot_fast_final=False)
    fast = encode_text(qp, cfg, toks, eot_fast_final=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fast), atol=1e-5)


def test_remat_cfg_falls_back_to_full_blocks(small):
    cfg, params = small
    import dataclasses

    cfg_remat = dataclasses.replace(cfg, remat=True)
    rng = np.random.default_rng(3)
    u8 = jnp.asarray(rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8))
    ref = encode_staged_u8(params, cfg, u8, cls_fast_final=False)
    out = encode_staged_u8(params, cfg_remat, u8, cls_fast_final=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)
