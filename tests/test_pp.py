"""Pipeline parallelism (`parallel.pp`): GPipe microbatching over a
``stage`` mesh axis, activations hopping stages via ppermute.

Parity gates: pipelined vision/text encodes must be EXACTLY the
single-device `encode_image`/`encode_text` (fp32, same contractions per
microbatch row), for pure pp, dp×pp, and gradients through the pipeline.
Runs on the virtual 8-device CPU mesh (tests/conftest.py).
"""

import dataclasses

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
from evr_tpu.parallel import pp


@pytest.fixture(scope="module")
def setup():
    cfg = CLIPConfig(
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=4, heads=4),
        text=TextConfig(context_length=16, vocab_size=128, width=32, layers=4, heads=2),
        embed_dim=16,
        attn_impl="xla",
    )
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    toks = rng.integers(1, 126, (8, 16)).astype(np.int32)
    for b in range(8):
        toks[b, rng.integers(1, 16)] = 127
    return cfg, params, pixels, jnp.asarray(toks)


def test_stack_unstack_roundtrip(setup):
    _, params, _, _ = setup
    blocks = params["visual"]["blocks"]
    stacked = pp.stack_blocks(blocks)
    back = pp.unstack_blocks(stacked)
    assert len(back) == len(blocks)
    for a, b in zip(blocks, back):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
            a,
            b,
        )


def test_pipelined_image_encode_exact(setup):
    cfg, params, pixels, _ = setup
    mesh = get_mesh(4, axis_names=("stage",))
    enc = pp.make_pipelined_image_encode(mesh, cfg, n_micro=4)
    ref = np.asarray(encode_image(params, cfg, pixels))
    out = np.asarray(enc(params, pixels))
    np.testing.assert_allclose(ref, out, atol=1e-5)


def test_pipelined_image_encode_2stage_many_micro(setup):
    cfg, params, pixels, _ = setup
    mesh = get_mesh(2, axis_names=("stage",))
    enc = pp.make_pipelined_image_encode(mesh, cfg, n_micro=8)
    ref = np.asarray(encode_image(params, cfg, pixels))
    out = np.asarray(enc(params, pixels))
    np.testing.assert_allclose(ref, out, atol=1e-5)


def test_pipelined_text_encode_exact(setup):
    cfg, params, _, toks = setup
    mesh = get_mesh(4, axis_names=("stage",))
    enc = pp.make_pipelined_text_encode(mesh, cfg, n_micro=4)
    ref = np.asarray(encode_text(params, cfg, toks))
    out = np.asarray(enc(params, toks))
    np.testing.assert_allclose(ref, out, atol=1e-5)


def test_dp_x_pp_image_encode_exact(setup):
    cfg, params, pixels, _ = setup
    mesh = get_mesh(8, axis_names=("data", "stage"), shape=(2, 4))
    enc = pp.make_pipelined_image_encode(
        mesh, cfg, n_micro=2, data_axis="data"
    )
    ref = np.asarray(encode_image(params, cfg, pixels))
    out = np.asarray(enc(params, pixels))
    np.testing.assert_allclose(ref, out, atol=1e-5)


def test_uneven_stages_raises(setup):
    cfg, _, _, _ = setup
    mesh = get_mesh(3, axis_names=("stage",))
    with pytest.raises(ValueError, match="do not split evenly"):
        pp.make_pipelined_image_encode(mesh, cfg, n_micro=4)


def test_grad_through_pipeline_matches_single_device(setup):
    cfg, params, pixels, _ = setup
    mesh = get_mesh(4, axis_names=("stage",))
    enc = pp.make_pipelined_image_encode(mesh, cfg, n_micro=4)
    tgt = jnp.ones((8, cfg.embed_dim), jnp.float32)

    def loss_pp(p):
        return jnp.mean((enc(p, pixels) - tgt) ** 2)

    def loss_ref(p):
        return jnp.mean((encode_image(p, cfg, pixels) - tgt) ** 2)

    g_pp = jax.grad(loss_pp)(params)
    g_ref = jax.grad(loss_ref)(params)
    # compare representative leaves: first/last stage blocks + the tail
    for path in (
        ("visual", "blocks", 0, "attn", "qkv", "kernel"),
        ("visual", "blocks", 3, "mlp", "proj", "kernel"),
        ("visual", "ln_post", "scale"),
        ("visual", "proj"),
    ):
        a, b = g_pp, g_ref
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg=f"grad mismatch at {path}",
        )


def test_presplit_encode_exact(setup):
    """The serving shape: staged stacks device-resident via stage_params,
    passed pre-split so no per-call restack."""
    cfg, params, pixels, toks = setup
    mesh = get_mesh(4, axis_names=("stage",))
    rest, v_stacked, t_stacked = pp.stage_params(mesh, params)
    enc_i = pp.make_pipelined_image_encode(mesh, cfg, n_micro=4, presplit=True)
    enc_t = pp.make_pipelined_text_encode(mesh, cfg, n_micro=4, presplit=True)
    np.testing.assert_allclose(
        np.asarray(enc_i(rest, v_stacked, pixels)),
        np.asarray(encode_image(params, cfg, pixels)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(enc_t(rest, t_stacked, toks)),
        np.asarray(encode_text(params, cfg, toks)),
        atol=1e-5,
    )


def test_stage_params_placement(setup):
    cfg, params, _, _ = setup
    mesh = get_mesh(4, axis_names=("stage",))
    rest, v_stacked, t_stacked = pp.stage_params(mesh, params)
    leaf = jax.tree_util.tree_leaves(v_stacked)[0]
    assert leaf.shape[0] == cfg.vision.layers
    # stage-sharded: each device holds L/S layers of each leaf
    db = leaf.sharding.shard_shape(leaf.shape)
    assert db[0] == cfg.vision.layers // 4
    assert rest["visual"]["blocks"] == ()
