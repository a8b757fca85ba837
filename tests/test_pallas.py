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


@pytest.mark.parametrize("T", [50, 577])
def test_flash_attention_nopad_path_matches_xla(rng, T):
    """The whole-sequence single-block path (no host padding) is exact."""
    B, H, d = 1, 2, 64
    q = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    ours = np.asarray(flash_attention(q, k, v, causal=False))
    ref = np.asarray(_xla_attention(q, k, v, False))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
    # forcing the padded multi-block path agrees too
    blocked = np.asarray(flash_attention(q, k, v, causal=False, block_q=128))
    np.testing.assert_allclose(blocked, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_grad_matches_xla(rng, causal):
    """custom_vjp backward (XLA recompute) matches grads of the XLA path."""
    B, H, T, d = 1, 2, 77, 64
    q = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, causal) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)


def test_attention_auto_impl_dispatch(rng):
    """impl='auto' on CPU resolves to the XLA path at every length."""
    from evr_tpu.models.layers import attention, init_attention

    width, heads = 128, 2
    p = init_attention(jax.random.PRNGKey(0), width)
    x = jnp.asarray(rng.normal(size=(2, 600, width)).astype(np.float32))
    auto = np.asarray(attention(x, p, heads, impl="auto"))
    xla = np.asarray(attention(x, p, heads, impl="xla"))
    np.testing.assert_allclose(auto, xla, rtol=1e-5, atol=1e-5)


def test_fused_block_matches_xla_composition(rng):
    """Both fused half-block kernels and their composition are exact."""
    from evr_tpu.models.layers import block_apply, init_block
    from evr_tpu.ops.block_fused import fused_attn_block, fused_block_apply, fused_mlp_block

    W, H = 128, 2
    p = init_block(jax.random.PRNGKey(0), W, 12)
    x = jnp.asarray(rng.normal(size=(8, 10, W)).astype(np.float32))
    ref = np.asarray(block_apply(x, p, H, False, "xla"))
    got = np.asarray(fused_block_apply(x, p, H))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    # attention half alone, at every packing group
    from evr_tpu.models.layers import attention, layer_norm

    attn_ref = np.asarray(x + attention(layer_norm(x, p["ln_1"]), p["attn"], H, False, "xla"))
    for g in (1, 2, 4):
        got_g = np.asarray(
            fused_attn_block(
                x, p["ln_1"]["scale"], p["ln_1"]["bias"],
                p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"],
                p["attn"]["out"]["kernel"], p["attn"]["out"]["bias"],
                n_heads=H, group=g,
            )
        )
        np.testing.assert_allclose(got_g, attn_ref, rtol=2e-4, atol=2e-4)
    # mlp half alone, including the row-padding path
    from evr_tpu.models.layers import linear, quick_gelu

    mlp_ref = np.asarray(
        x + linear(quick_gelu(linear(layer_norm(x, p["ln_2"]), p["mlp"]["fc"])), p["mlp"]["proj"])
    )
    got_m = np.asarray(
        fused_mlp_block(
            x, p["ln_2"]["scale"], p["ln_2"]["bias"],
            p["mlp"]["fc"]["kernel"], p["mlp"]["fc"]["bias"],
            p["mlp"]["proj"]["kernel"], p["mlp"]["proj"]["bias"],
            block_rows=16,
        )
    )
    np.testing.assert_allclose(got_m, mlp_ref, rtol=2e-4, atol=2e-4)


def test_merged_block_bit_identical_to_two_kernel(rng):
    """`fused_block_merged` (the measured-slower one-kernel design probe —
    see its docstring) must stay BIT-identical to the routed two-kernel
    composition, causal and not."""
    from evr_tpu.models.layers import init_block
    from evr_tpu.ops.block_fused import fused_block_apply, fused_block_merged

    W, H = 128, 2
    p = init_block(jax.random.PRNGKey(3), W, 12)
    x32 = jnp.asarray(rng.normal(size=(8, 10, W)).astype(np.float32))
    for dtype in (jnp.float32, jnp.bfloat16):
        x = x32.astype(dtype)
        for causal, act in ((False, "quick_gelu"), (True, "gelu")):
            two = np.asarray(fused_block_apply(x, p, H, act, causal).astype(jnp.float32))
            one = np.asarray(fused_block_merged(x, p, H, act, causal).astype(jnp.float32))
            np.testing.assert_array_equal(two, one)


def test_fused_block_grad_matches_xla(rng):
    """custom_vjp backward (XLA recompute) matches the XLA block's grads."""
    from evr_tpu.models.layers import block_apply, init_block
    from evr_tpu.ops.block_fused import fused_block_apply

    W, H = 128, 2
    p = init_block(jax.random.PRNGKey(1), W, 12)
    x = jnp.asarray(rng.normal(size=(4, 10, W)).astype(np.float32))
    gf = jax.grad(lambda x_, p_: jnp.sum(fused_block_apply(x_, p_, H) ** 2), argnums=(0, 1))(x, p)
    gx = jax.grad(
        lambda x_, p_: jnp.sum(block_apply(x_, p_, H, False, "xla") ** 2), argnums=(0, 1)
    )(x, p)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        ),
        gf,
        gx,
    )


@pytest.mark.parametrize("B", [3, 8])  # G=1 and G=4 packing
def test_fused_block_causal_matches_xla(rng, B):
    """Causal (text-tower) fused block, packed and unpacked."""
    from evr_tpu.models.layers import block_apply, init_block
    from evr_tpu.ops.block_fused import fused_block_apply

    W, H = 128, 2
    p = init_block(jax.random.PRNGKey(3), W, 12)
    x = jnp.asarray(rng.normal(size=(B, 10, W)).astype(np.float32))
    ref = np.asarray(block_apply(x, p, H, True, "xla"))
    got = np.asarray(fused_block_apply(x, p, H, "quick_gelu", True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "B,T,causal",
    [(1, 3, False), (5, 13, True), (8, 64, False), (2, 130, True), (3, 50, False)],
)
def test_fused_block_shape_fuzz(rng, B, T, causal):
    """Odd batch/length combinations: packing, padding, causal all agree."""
    from evr_tpu.models.layers import block_apply, init_block
    from evr_tpu.ops.block_fused import fused_block_apply

    W, H = 128, 2
    p = init_block(jax.random.PRNGKey(B * 100 + T), W, 12)
    x = jnp.asarray(rng.normal(size=(B, T, W)).astype(np.float32))
    ref = np.asarray(block_apply(x, p, H, causal, "xla"))
    got = np.asarray(fused_block_apply(x, p, H, "quick_gelu", causal))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_quant_block_matches_xla_quant(rng, causal):
    """int8 fused block == the XLA quantized_linear composition."""
    from evr_tpu.models.layers import attention, init_block, layer_norm, linear, quick_gelu
    from evr_tpu.models.quant import _quantize_block
    from evr_tpu.ops.block_fused import fused_quant_block_apply

    W, H = 128, 2
    p = init_block(jax.random.PRNGKey(4), W, 12)
    pq = _quantize_block(p)
    pq["ln_1"], pq["ln_2"] = p["ln_1"], p["ln_2"]
    x = jnp.asarray(rng.normal(size=(8, 10, W)).astype(np.float32))

    y = x + attention(layer_norm(x, pq["ln_1"]), pq["attn"], H, causal, "xla")
    h = quick_gelu(linear(layer_norm(y, pq["ln_2"]), pq["mlp"]["fc"]))
    ref = np.asarray(y + linear(h, pq["mlp"]["proj"]))
    got = np.asarray(fused_quant_block_apply(x, pq, H, "quick_gelu", causal))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_fused_block_gelu_activation(rng):
    """The exact-GELU (OpenCLIP tower) activation variant is exact too."""
    from evr_tpu.models.layers import block_apply, init_block
    from evr_tpu.ops.block_fused import fused_block_apply

    W, H = 128, 2
    p = init_block(jax.random.PRNGKey(2), W, 12)
    x = jnp.asarray(rng.normal(size=(2, 10, W)).astype(np.float32))
    ref = np.asarray(block_apply(x, p, H, False, "xla", "gelu"))
    got = np.asarray(fused_block_apply(x, p, H, "gelu"))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


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


def test_fused_topk_matches_xla_fp32_and_int8():
    from evr_tpu.ops.retrieval_pallas import fused_topk
    from evr_tpu.ops.topk import cosine_topk

    rng = np.random.default_rng(7)
    N, D, Q, K = 1024, 128, 5, 10  # Q=5 exercises sublane padding
    idx = rng.normal(size=(N, D)).astype(np.float32)
    idx /= np.linalg.norm(idx, axis=1, keepdims=True)
    q = rng.normal(size=(Q, D)).astype(np.float32)

    ref_s, ref_r = cosine_topk(
        jnp.asarray(idx), jnp.asarray(q), jnp.int32(3), jnp.int32(900), K
    )
    s, r = fused_topk(
        jnp.asarray(idx), jnp.asarray(q), jnp.int32(3), jnp.int32(900), K, tile_n=256
    )
    assert bool(jnp.all(r == ref_r))
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), atol=1e-5)
    # row-range mask respected
    assert int(jnp.min(r)) >= 3 and int(jnp.max(r)) < 900

    scales = np.abs(idx).max(axis=1) / 127.0
    qi = np.clip(np.round(idx / scales[:, None]), -127, 127).astype(np.int8)
    ref_s2, ref_r2 = cosine_topk(
        jnp.asarray(qi), jnp.asarray(q), jnp.int32(0), jnp.int32(N), K,
        row_scales=jnp.asarray(scales),
    )
    s2, r2 = fused_topk(
        jnp.asarray(qi), jnp.asarray(q), jnp.int32(0), jnp.int32(N), K,
        row_scales=jnp.asarray(scales), tile_n=256,
    )
    assert bool(jnp.all(r2 == ref_r2))
    np.testing.assert_allclose(np.asarray(s2), np.asarray(ref_s2), atol=1e-3)


def test_frameindex_pallas_impl_matches_xla():
    from evr_tpu.index import FrameIndex

    rng = np.random.default_rng(11)
    emb = rng.normal(size=(700, 64)).astype(np.float32)
    q = rng.normal(size=(3, 64)).astype(np.float32)
    xla = FrameIndex(embed_dim=64, pad_multiple=1024)
    pls = FrameIndex(embed_dim=64, pad_multiple=1024, search_impl="pallas")
    for ix in (xla, pls):
        ix.add_video("a", emb[:400])
        ix.add_video("b", emb[400:])
    s1, r1 = xla.search_raw(q, 7)
    s2, r2 = pls.search_raw(q, 7)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)
    # per-video scoping agrees too
    s1, r1 = xla.search_raw(q, 5, video_name="b")
    s2, r2 = pls.search_raw(q, 5, video_name="b")
    np.testing.assert_array_equal(r1, r2)


def test_sharded_fused_topk_matches_single_device():
    from evr_tpu.ops.topk import cosine_topk
    from evr_tpu.parallel import get_mesh
    from evr_tpu.parallel.sharded_search import sharded_cosine_topk

    mesh = get_mesh(8)
    rng = np.random.default_rng(3)
    N, D, Q, K = 4096, 64, 4, 8  # 512 rows/shard -> tile_n 512
    idx = rng.normal(size=(N, D)).astype(np.float32)
    idx /= np.linalg.norm(idx, axis=1, keepdims=True)
    q = rng.normal(size=(Q, D)).astype(np.float32)
    start, end = jnp.int32(100), jnp.int32(3900)

    ref_s, ref_r = cosine_topk(jnp.asarray(idx), jnp.asarray(q), start, end, K)
    s, r = sharded_cosine_topk(
        mesh, jnp.asarray(idx), jnp.asarray(q), start, end, K, impl="pallas"
    )
    np.testing.assert_array_equal(np.asarray(r), np.asarray(ref_r))
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), atol=1e-5)


def test_serving_context_pallas_index_options(tmp_path):
    from evr_tpu.config import DataRootConfig
    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
    from evr_tpu.serving import ServingContext

    cfg = CLIPConfig(
        embed_dim=64,
        vision=VisionConfig(32, 8, 64, 1, 2),
        text=TextConfig(16, 600, 64, 1, 2),
    )
    rng = np.random.default_rng(5)
    emb = rng.normal(size=(300, 64)).astype(np.float32)
    q = rng.normal(size=(1, 64)).astype(np.float32)

    hits = {}
    for impl in ("xla", "pallas"):
        ctx = ServingContext(
            DataRootConfig(tmp_path / impl),
            engine=EmbeddingEngine(cfg=cfg, batch_size=4),
            search_impl=impl,
        )
        idx = ctx.index_for("original")
        assert idx.search_impl == impl
        idx.add_video("v", emb)
        hits[impl] = idx.search_raw(q, 5)
    np.testing.assert_array_equal(hits["xla"][1], hits["pallas"][1])
    # int8 storage option plumbs through too
    ctx = ServingContext(
        DataRootConfig(tmp_path / "i8"),
        engine=EmbeddingEngine(cfg=cfg, batch_size=4),
        index_dtype="int8",
        search_impl="pallas",
    )
    idx = ctx.index_for("original")
    idx.add_video("v", emb)
    s, r = idx.search_raw(q, 5)
    assert np.isfinite(s).all()
