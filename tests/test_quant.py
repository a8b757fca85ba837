"""Int8 quantized inference path (evr_tpu.models.quant).

The reference has no quantization; this is a TPU-native capability (MXU int8
is 2x bf16 peak on v5e). These tests pin the numerics: quantized linears stay
within the expected int8 error envelope, whole-tower embeddings stay
direction-faithful to fp32, and retrieval rankings over a synthetic index
agree at the top.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evr_tpu.models import clip as jclip
from evr_tpu.models.layers import init_linear, linear
from evr_tpu.models.quant import (
    is_quantized_linear,
    quantize_clip_params,
    quantize_linear_params,
    quantized_linear,
)


@pytest.fixture(scope="module")
def small_cfg():
    return jclip.CLIPConfig(
        embed_dim=64,
        vision=jclip.VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=jclip.TextConfig(context_length=16, vocab_size=512, width=64, layers=2, heads=4),
    )


@pytest.fixture(scope="module")
def small_params(small_cfg):
    return jclip.init_clip_params(jax.random.PRNGKey(0), small_cfg)


def test_quantized_linear_error_envelope():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 40, 96)).astype(np.float32))
    p = init_linear(jax.random.PRNGKey(1), 96, 128)
    ref = linear(x, p)
    q = quantized_linear(x, quantize_linear_params(p))
    # per-token symmetric int8 on Gaussian data: relative error well under 2%
    rel = float(jnp.linalg.norm(ref - q) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_linear_dispatches_on_quantized_structure():
    p = init_linear(jax.random.PRNGKey(0), 16, 16)
    pq = quantize_linear_params(p)
    assert is_quantized_linear(pq) and not is_quantized_linear(p)
    x = jnp.ones((2, 16), jnp.float32)
    assert np.allclose(np.asarray(linear(x, pq)), np.asarray(quantized_linear(x, pq)))


def test_quantize_clip_params_idempotent(small_params):
    qp = quantize_clip_params(small_params)
    qp2 = quantize_clip_params(qp)  # no KeyError, structurally identical
    b1 = qp["visual"]["blocks"][0]["attn"]["qkv"]
    b2 = qp2["visual"]["blocks"][0]["attn"]["qkv"]
    np.testing.assert_array_equal(np.asarray(b1["kernel_q"]), np.asarray(b2["kernel_q"]))


def test_quantize_clip_params_structure(small_params):
    qp = quantize_clip_params(small_params)
    for tower in ("visual", "text"):
        for blk in qp[tower]["blocks"]:
            for leaf in (blk["attn"]["qkv"], blk["attn"]["out"], blk["mlp"]["fc"], blk["mlp"]["proj"]):
                assert leaf["kernel_q"].dtype == jnp.int8
                assert "kernel" not in leaf
        # non-block params untouched (same objects)
        assert qp[tower] is not small_params[tower]
    assert qp["visual"]["patch_embed"] is small_params["visual"]["patch_embed"]
    # original params pytree is not mutated
    assert "kernel" in small_params["visual"]["blocks"][0]["attn"]["qkv"]


def test_int8_tower_embeddings_track_fp32(small_cfg, small_params):
    rng = np.random.default_rng(1)
    qp = quantize_clip_params(small_params)

    pixels = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    img_fp = np.asarray(jclip.encode_image(small_params, small_cfg, pixels))
    img_q = np.asarray(jclip.encode_image(qp, small_cfg, pixels))

    tokens = np.zeros((4, 16), np.int32)
    tokens[:, 0] = 509
    lengths = [3, 7, 10, 14]
    for i, ln in enumerate(lengths):
        tokens[i, 1:ln] = rng.integers(1, 500, size=ln - 1)
        tokens[i, ln] = 511  # EOT = largest id
    txt_fp = np.asarray(jclip.encode_text(small_params, small_cfg, jnp.asarray(tokens)))
    txt_q = np.asarray(jclip.encode_text(qp, small_cfg, jnp.asarray(tokens)))

    def cos(a, b):
        a = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True)
        return np.sum(a * b, axis=-1)

    assert cos(img_fp, img_q).min() > 0.99, cos(img_fp, img_q)
    assert cos(txt_fp, txt_q).min() > 0.99, cos(txt_fp, txt_q)


def test_int8_retrieval_rank_agreement(small_cfg, small_params):
    """Top-k over a synthetic frame set: int8 encode must agree with fp32 on
    the clear winners (rank-1 identical, top-5 overlap >= 4/5)."""
    rng = np.random.default_rng(2)
    qp = quantize_clip_params(small_params)
    frames = jnp.asarray(rng.normal(size=(64, 32, 32, 3)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))

    def embed(params, x):
        e = np.asarray(jclip.encode_image(params, small_cfg, x))
        return e / np.linalg.norm(e, axis=-1, keepdims=True)

    idx_fp, q_fp = embed(small_params, frames), embed(small_params, queries)
    idx_q, q_q = embed(qp, frames), embed(qp, queries)
    top_fp = np.argsort(-(q_fp @ idx_fp.T), axis=1)[:, :5]
    top_q = np.argsort(-(q_q @ idx_q.T), axis=1)[:, :5]
    assert (top_fp[:, 0] == top_q[:, 0]).mean() >= 0.875  # 7/8 rank-1 agreement
    overlap = [len(set(a) & set(b)) for a, b in zip(top_fp, top_q)]
    assert np.mean(overlap) >= 4.0, overlap


def test_fused_searchers_respect_index_storage_dtype(small_cfg):
    """Regression: the fused text/image searchers must score a bf16/int8
    index exactly like FrameIndex.search_raw does (an int8 index cast the
    fp32 query to int8 before this fix, zeroing every score)."""
    from evr_tpu.index import EmbeddingEngine, FrameIndex
    from evr_tpu.index.fused_image_search import ImageSearcher
    from evr_tpu.index.fused_search import TextSearcher

    rng = np.random.default_rng(5)
    eng = EmbeddingEngine(cfg=small_cfg, batch_size=4, rng_seed=0)
    emb = rng.normal(size=(40, small_cfg.embed_dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)

    for dtype_name in ("float32", "bfloat16", "int8"):
        idx = FrameIndex(
            embed_dim=small_cfg.embed_dim, pad_multiple=64, device_dtype=dtype_name
        )
        idx.add_video("v", emb)

        ts = TextSearcher(eng, idx)
        q = "people running"
        s_fused, r_fused = ts.search(q, 5)
        vec = eng.encode_texts([q])
        s_raw, r_raw = idx.search_raw(vec, 5)
        np.testing.assert_array_equal(r_fused, r_raw, err_msg=dtype_name)
        np.testing.assert_allclose(s_fused, s_raw, rtol=1e-4, atol=1e-5)

        imgs = (rng.random((1, 32, 32, 3)) * 255).astype(np.uint8)
        is_ = ImageSearcher(eng, idx)
        s_img, r_img = is_.search(imgs, 5)
        ivec = eng.encode_staged_images(imgs, normalise=True)
        s_iraw, r_iraw = idx.search_raw(ivec, 5)
        np.testing.assert_array_equal(r_img, r_iraw, err_msg=dtype_name)
        np.testing.assert_allclose(s_img, s_iraw, rtol=1e-4, atol=1e-5)


def test_engine_int8_params_dtype(tmp_path):
    from evr_tpu.index import EmbeddingEngine

    cfg = jclip.CLIPConfig(
        embed_dim=32,
        vision=jclip.VisionConfig(image_size=32, patch_size=8, width=32, layers=1, heads=2),
        text=jclip.TextConfig(context_length=16, vocab_size=49408, width=32, layers=1, heads=2),
    )
    eng = EmbeddingEngine(cfg=cfg, batch_size=4, params_dtype="int8")
    blk = eng.params["visual"]["blocks"][0]
    assert blk["attn"]["qkv"]["kernel_q"].dtype == jnp.int8
    rng = np.random.default_rng(0)
    staged = (rng.random((3, 32, 32, 3)) * 255).astype(np.uint8)
    emb = eng.encode_staged_images(staged, normalise=True)
    assert emb.shape == (3, 32)
    assert np.isfinite(emb).all()
    txt = eng.encode_texts(["a fight in the street"])
    assert np.isfinite(txt).all()
    # registered models inherit the engine's serving format
    eng.register_model("second", jclip.init_clip_params(jax.random.PRNGKey(3), cfg))
    assert eng.models["second"]["clip"]["visual"]["blocks"][0]["mlp"]["fc"]["kernel_q"].dtype == jnp.int8


def test_all_integer_serving_path(small_cfg):
    """int8 towers + int8 index storage compose end-to-end: the fused
    one-dispatch search over the quantized stack must reproduce the exact
    cosine ranking of the embeddings it indexed (index quantization is
    rescaled post-GEMM), with scores within the int8-storage envelope."""
    from evr_tpu.index import EmbeddingEngine, FrameIndex
    from evr_tpu.index.fused_search import TextSearcher

    rng = np.random.default_rng(4)
    staged = (rng.random((24, 32, 32, 3)) * 255).astype(np.uint8)

    eng_q = EmbeddingEngine(cfg=small_cfg, batch_size=8, rng_seed=0, params_dtype="int8")
    # int8 towers must produce finite, unit-norm embeddings end-to-end
    emb_tower = eng_q.encode_staged_images(staged, normalise=True)
    assert np.isfinite(emb_tower).all()
    np.testing.assert_allclose(np.linalg.norm(emb_tower, axis=-1), 1.0, atol=1e-5)

    # index rows: well-separated unit vectors (random-model embeddings of
    # noise images are near-collinear, which makes rank assertions measure
    # the degenerate data, not the pipeline)
    emb_q = rng.normal(size=(24, small_cfg.embed_dim)).astype(np.float32)
    emb_q /= np.linalg.norm(emb_q, axis=-1, keepdims=True)
    idx_q = FrameIndex(embed_dim=small_cfg.embed_dim, pad_multiple=64, device_dtype="int8")
    idx_q.add_video("v", emb_q)

    searcher = TextSearcher(eng_q, idx_q)
    for q in ["violent fight scene", "a calm beach", "city traffic at night"]:
        scores, rows = searcher.search(q, 5)
        assert np.isfinite(scores).all()
        # ground truth: fp32 cosine of the same int8-tower embeddings
        tq = eng_q.encode_texts([q])[0]
        exact = emb_q @ tq
        expect = np.argsort(-exact)[:5]
        assert len(set(rows[0].tolist()) & set(expect.tolist())) >= 4
        np.testing.assert_allclose(
            scores[0], np.sort(exact)[::-1][:5], atol=0.02, rtol=0.05
        )


def test_int8_rank_agreement_real_frames(reference_fixtures):
    """int8 quantization armor on REAL image statistics: embeds all 846
    reference fixture frames fp32 vs int8 (thin 224² towers) and pins the
    agreement actually measured on this corpus (cos min 0.99990, top-1
    agreement 5/5 queries, top-10 overlap 9–10/10) with margin."""
    import pathlib

    from evr_tpu.models.clip import (
        CLIPConfig, TextConfig, VisionConfig, encode_image, encode_text,
        init_clip_params,
    )
    from evr_tpu.native import NativeStager, native_available
    from evr_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD
    from evr_tpu.tokenizer import tokenize

    if not native_available():
        pytest.skip("native staging library unavailable")

    frames_root = pathlib.Path(reference_fixtures) / "static" / "processed_frames"
    paths = sorted(frames_root.glob("*/*.jpg"))
    assert len(paths) > 800, f"expected the 846 fixture frames, found {len(paths)}"

    cfg = CLIPConfig(
        embed_dim=64,
        vision=VisionConfig(image_size=224, patch_size=32, width=64, layers=2, heads=4),
        text=TextConfig(context_length=77, vocab_size=49408, width=64, layers=2, heads=4),
    )
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_clip_params(params)

    @jax.jit
    def embed(p, px):
        f = encode_image(p, cfg, px, dtype=jnp.float32)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    mean = np.asarray(CLIP_MEAN, np.float32)
    std = np.asarray(CLIP_STD, np.float32)
    staged, ok = NativeStager(image_size=224).stage_batch(paths)
    e_fp, e_q = [], []
    B = 64
    for i in range(0, len(paths), B):
        x = jnp.asarray((staged[i : i + B].astype(np.float32) / 255.0 - mean) / std)
        e_fp.append(np.asarray(embed(params, x)))
        e_q.append(np.asarray(embed(qp, x)))
    e_fp, e_q = np.concatenate(e_fp), np.concatenate(e_q)

    cos = (e_fp * e_q).sum(-1)
    assert cos.min() >= 0.999, f"per-frame cosine dropped to {cos.min()}"

    queries = [
        "a person fighting on the street", "a crowd of people",
        "a car on the road", "two men in a room", "violence",
    ]
    toks = tokenize(queries)

    def temb(p):
        t = np.asarray(encode_text(p, cfg, jnp.asarray(toks), dtype=jnp.float32))
        return t / np.linalg.norm(t, axis=-1, keepdims=True)

    t_fp, t_q = temb(params), temb(qp)
    top_fp = np.argsort(-(e_fp @ t_fp.T), axis=0)[:10]
    top_q = np.argsort(-(e_q @ t_q.T), axis=0)[:10]
    assert (top_fp[0] == top_q[0]).all(), "int8 changed a rank-1 result"
    overlap = [
        len(set(top_fp[:, j]) & set(top_q[:, j])) for j in range(len(queries))
    ]
    assert min(overlap) >= 8, overlap
