"""Sequence parallelism (`parallel.sp`): token-axis-sharded blocks with
all-gathered K/V. Exactness gates vs single-device `encode_image`/
`encode_text`, including the ragged case (T=17 padded over the shards)
and the causal text tower (global-row-id masking). Virtual 8-device CPU
mesh via tests/conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evr_tpu.models.clip import (
    CLIPConfig,
    TextConfig,
    VisionConfig,
    encode_image,
    encode_text,
    init_clip_params,
)
from evr_tpu.parallel.mesh import get_mesh
from evr_tpu.parallel import sp


@pytest.fixture(scope="module")
def setup():
    cfg = CLIPConfig(
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=3, heads=4),
        text=TextConfig(context_length=16, vocab_size=128, width=32, layers=2, heads=2),
        embed_dim=16,
        attn_impl="xla",
    )
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    toks = rng.integers(1, 126, (4, 16)).astype(np.int32)
    for b in range(4):
        toks[b, rng.integers(1, 16)] = 127
    return cfg, params, pixels, jnp.asarray(toks)


def test_sp_image_encode_exact_with_padding(setup):
    # T = 4*4+1 = 17 tokens over 2 shards → padded to 18; padded key
    # columns must never leak into real rows.
    cfg, params, pixels, _ = setup
    mesh = get_mesh(2, axis_names=("seq",))
    enc = sp.make_sp_image_encode(mesh, cfg)
    ref = np.asarray(encode_image(params, cfg, pixels))
    out = np.asarray(enc(params, pixels))
    np.testing.assert_allclose(ref, out, atol=1e-5)


def test_sp_image_encode_4way(setup):
    cfg, params, pixels, _ = setup
    mesh = get_mesh(4, axis_names=("seq",))
    enc = sp.make_sp_image_encode(mesh, cfg)
    ref = np.asarray(encode_image(params, cfg, pixels))
    out = np.asarray(enc(params, pixels))
    np.testing.assert_allclose(ref, out, atol=1e-5)


def test_sp_text_encode_causal_exact(setup):
    cfg, params, _, toks = setup
    mesh = get_mesh(4, axis_names=("seq",))
    enc = sp.make_sp_text_encode(mesh, cfg)
    ref = np.asarray(encode_text(params, cfg, toks))
    out = np.asarray(enc(params, toks))
    np.testing.assert_allclose(ref, out, atol=1e-5)


def test_sp_text_encode_ragged_shards(setup):
    # context 16 over 3 shards → padded to 18; causal + padding mask must
    # compose (padded rows are also beyond every real row's causal window).
    cfg, params, _, toks = setup
    mesh = get_mesh(3, axis_names=("seq",))
    enc = sp.make_sp_text_encode(mesh, cfg)
    ref = np.asarray(encode_text(params, cfg, toks))
    out = np.asarray(enc(params, toks))
    np.testing.assert_allclose(ref, out, atol=1e-5)


def test_dp_x_sp_image_encode(setup):
    cfg, params, pixels, _ = setup
    mesh = get_mesh(8, axis_names=("data", "seq"), shape=(2, 4))
    enc = sp.make_sp_image_encode(mesh, cfg, data_axis="data")
    ref = np.asarray(encode_image(params, cfg, pixels))
    out = np.asarray(enc(params, pixels))
    np.testing.assert_allclose(ref, out, atol=1e-5)


def test_sp_grad_exact(setup):
    cfg, params, pixels, _ = setup
    mesh = get_mesh(2, axis_names=("seq",))
    enc = sp.make_sp_image_encode(mesh, cfg)
    tgt = jnp.ones((4, cfg.embed_dim), jnp.float32)

    g_sp = jax.grad(lambda p: jnp.mean((enc(p, pixels) - tgt) ** 2))(params)
    g_ref = jax.grad(
        lambda p: jnp.mean((encode_image(p, cfg, pixels) - tgt) ** 2)
    )(params)
    for path in (
        ("visual", "blocks", 0, "attn", "qkv", "kernel"),
        ("visual", "blocks", 2, "mlp", "fc", "kernel"),
        ("visual", "patch_embed", "kernel"),
    ):
        a, b = g_sp, g_ref
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg=f"grad mismatch at {path}",
        )
