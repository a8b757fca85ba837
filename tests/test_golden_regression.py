"""Golden-numerics regression armor: the tiny-model outputs committed in
tests/golden/ must be reproduced bit-closely by the current code. Catches
silent numerics drift from refactors (attention math, LN order, pooling,
init changes) without needing torch.

Regenerate ONLY on intentional numerics changes (see the npz-producing
snippet in git history for commit 'Golden regression fixtures')."""

import pathlib

import numpy as np

import jax
import jax.numpy as jnp

from evr_tpu.models.clip import (
    CLIPConfig,
    TextConfig,
    VisionConfig,
    encode_image,
    encode_text,
    init_clip_params,
)

GOLDEN = pathlib.Path(__file__).parent / "golden" / "tiny_clip_golden.npz"


def test_golden_numerics():
    blob = np.load(GOLDEN)
    cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=TextConfig(context_length=16, vocab_size=600, width=64, layers=2, heads=4),
    )
    params = init_clip_params(jax.random.PRNGKey(1234), cfg)
    img = np.asarray(encode_image(params, cfg, jnp.asarray(blob["pixels"])))
    txt = np.asarray(encode_text(params, cfg, jnp.asarray(blob["tokens"])))
    np.testing.assert_allclose(img, blob["image_embeddings"], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(txt, blob["text_embeddings"], rtol=2e-4, atol=2e-4)
