"""int8 rank-agreement gate (models/quant_gate.py) — the widened armor
behind promoting int8 serving weights (VERDICT r2 #7).

Beyond the 846-fixture-frame test in test_quant.py, this adds: adversarial
near-duplicate corpora, per-video scoped agreement, the SigLIP family
(now int8-capable via the layers.linear dispatch), IVF-composed retrieval,
and the boot-time `--params-dtype auto` mechanics."""

import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from evr_tpu.models.quant_gate import (
    DEFAULT_GATE_QUERIES,
    GateReport,
    ranking_agreement,
    run_quant_gate,
    sample_corpus_frames,
)


# -- metric math ----------------------------------------------------------


def test_ranking_agreement_identical():
    rng = np.random.default_rng(0)
    sims = rng.normal(size=(100, 7))
    out = ranking_agreement(sims, sims.copy(), top_k=10)
    assert out["top1_agreement"] == 1.0
    assert out["min_topk_overlap"] == 10 and out["mean_topk_overlap"] == 10.0


def test_ranking_agreement_detects_flips():
    rng = np.random.default_rng(1)
    sims = rng.normal(size=(50, 4))
    flipped = sims.copy()
    # swap rank-1 and rank-30 for query 0 only
    order = np.argsort(-sims[:, 0])
    flipped[order[0], 0], flipped[order[30], 0] = (
        sims[order[30], 0],
        sims[order[0], 0],
    )
    out = ranking_agreement(sims, flipped, top_k=10)
    assert out["top1_agreement"] == 0.75  # 3/4 queries still agree
    assert out["min_topk_overlap"] == 9  # one member swapped out of the top-10


def test_ranking_agreement_small_corpus_caps_k():
    sims = np.random.default_rng(2).normal(size=(4, 3))
    out = ranking_agreement(sims, sims, top_k=10)
    assert out["top_k"] == 4 and out["min_topk_overlap"] == 4


# -- tiny engine fixtures ---------------------------------------------------


@pytest.fixture(scope="module")
def tiny_engine():
    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig

    cfg = CLIPConfig(
        embed_dim=64,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    return EmbeddingEngine(cfg=cfg, batch_size=16)


def _synthetic_frames(n=48, size=64, seed=0):
    """Structured (not pure-noise) synthetic frames: colour gradients with
    per-frame phase so embeddings form a meaningful neighbourhood graph."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    frames = []
    for i in range(n):
        r = 127 + 120 * np.sin(2 * np.pi * (xx + i / n))
        g = 127 + 120 * np.cos(2 * np.pi * (yy + i / (n + 3)))
        b = rng.uniform(0, 255) * np.ones_like(xx)
        frames.append(np.stack([r, g, b], -1))
    return np.clip(np.stack(frames), 0, 255).astype(np.uint8)


def test_gate_passes_on_structured_corpus(tiny_engine):
    staged = _synthetic_frames()
    report = run_quant_gate(tiny_engine, staged, queries=DEFAULT_GATE_QUERIES[:8])
    assert isinstance(report, GateReport)
    assert report.min_frame_cosine > 0.99, report
    assert report.n_frames == len(staged) and report.n_queries == 8


def test_gate_near_duplicate_adversarial(tiny_engine):
    """Near-duplicate corpus: every frame plus a ±2-intensity twin — the
    regime where int8 noise is most likely to flip ranks. The embedding
    agreement must hold; set-overlap metrics treat twin swaps correctly
    (both twins in the top-k keeps the overlap)."""
    base = _synthetic_frames(n=32)
    twins = np.clip(base.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    staged = np.concatenate([base, twins])
    report = run_quant_gate(tiny_engine, staged, queries=DEFAULT_GATE_QUERIES[:8])
    assert report.min_frame_cosine > 0.995, report
    assert report.mean_topk_overlap >= 9.0, report


@pytest.fixture(scope="module")
def fixture_frames():
    root = pathlib.Path("/root/reference/Backend/static/processed_frames")
    paths = sorted(root.glob("*/*.jpg"))
    if len(paths) < 100:
        pytest.skip("reference fixture frames not mounted")
    return paths


def test_gate_scoped_per_video_real_frames(tiny_engine, fixture_frames):
    """Scoped searches rank WITHIN one video's frames — fewer, more
    self-similar candidates, so flips are likelier than globally. Gate
    agreement per video on real frame statistics."""
    from collections import defaultdict

    from evr_tpu.index.engine import stage_image_fast
    from evr_tpu.models.quant import quantize_clip_params
    from evr_tpu.models.quant_gate import (
        _encode_staged_with,
        _encode_texts_with,
    )

    by_video = defaultdict(list)
    for p in fixture_frames:
        by_video[p.parent.name].append(p)
    queries = DEFAULT_GATE_QUERIES[:6]
    params = tiny_engine.params
    qp = quantize_clip_params(params)
    t_ref = _encode_texts_with(tiny_engine, params, queries)
    t_q = _encode_texts_with(tiny_engine, qp, queries)
    size = tiny_engine.cfg.vision.image_size
    for video, paths in sorted(by_video.items()):
        paths = paths[:80]
        staged = np.stack([stage_image_fast(p, size) for p in paths])
        e_ref = _encode_staged_with(tiny_engine, params, staged)
        e_q = _encode_staged_with(tiny_engine, qp, staged)
        out = ranking_agreement(e_ref @ t_ref.T, e_q @ t_q.T, top_k=10)
        assert out["min_topk_overlap"] >= 8, (video, out)
        assert out["top1_agreement"] >= 0.5, (video, out)
        cos = (e_ref * e_q).sum(-1)
        assert cos.min() > 0.999, (video, float(cos.min()))


def test_siglip_int8_rank_agreement():
    """The SigLIP family now routes block linears through layers.linear →
    int8 dispatch. Tiny random-init towers on structured frames: embedding
    direction and rankings must survive quantization."""
    from evr_tpu.index.siglip_engine import SiglipEngine
    from evr_tpu.models.siglip import SiglipConfig, SiglipTextConfig, SiglipVisionConfig

    cfg = SiglipConfig(
        vision=SiglipVisionConfig(image_size=64, patch_size=16, width=64,
                                  layers=2, heads=4, mlp_dim=128),
        text=SiglipTextConfig(width=64, layers=2, heads=4, mlp_dim=128,
                              context_length=16, vocab_size=256),
    )
    fp = SiglipEngine(cfg=cfg, batch_size=16, rng_seed=3)
    q = SiglipEngine(cfg=cfg, params=fp.params, batch_size=16, params_dtype="int8")
    staged = _synthetic_frames(n=40, size=64)
    e_fp = fp.encode_staged_images(staged)
    e_q = q.encode_staged_images(staged)
    cos = (e_fp * e_q).sum(-1)
    assert cos.min() > 0.995, float(cos.min())

    toks = np.random.default_rng(0).integers(1, 256, size=(6, 16)).astype(np.int32)
    t_fp = np.asarray(fp._encode_tokens(fp.params, jnp.asarray(toks)))
    t_q = np.asarray(q._encode_tokens(q.params, jnp.asarray(toks)))
    out = ranking_agreement(e_fp @ t_fp.T, e_q @ t_q.T, top_k=10)
    assert out["min_topk_overlap"] >= 8, out


def test_siglip_linear_refactor_exactness():
    """The layers.linear dispatch refactor must be a pure refactor: fp32
    forward identical to the kernel-slicing formulation it replaced."""
    from evr_tpu.models.siglip import (
        SiglipConfig, SiglipTextConfig, SiglipVisionConfig,
        encode_image, encode_text, init_siglip_params,
    )

    cfg = SiglipConfig(
        vision=SiglipVisionConfig(image_size=32, patch_size=16, width=32,
                                  layers=2, heads=2, mlp_dim=64),
        text=SiglipTextConfig(width=32, layers=2, heads=2, mlp_dim=64,
                              context_length=8, vocab_size=64),
    )
    params = init_siglip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    feats = np.asarray(encode_image(params, cfg, px, jnp.float32))

    # reference formulation: packed-kernel slicing (the pre-refactor math)
    def mha_ref(qv, kv, p, n_heads):
        b, tq, w = qv.shape
        tk = kv.shape[1]
        d = w // n_heads
        kk, bb = p["qkv"]["kernel"], p["qkv"]["bias"]
        qh = (qv @ kk[:, :w] + bb[:w]).reshape(b, tq, n_heads, d)
        kh = (kv @ kk[:, w:2*w] + bb[w:2*w]).reshape(b, tk, n_heads, d)
        vh = (kv @ kk[:, 2*w:] + bb[2*w:]).reshape(b, tk, n_heads, d)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(jnp.float32(d))
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, vh).reshape(b, tq, w)
        return o @ p["out"]["kernel"] + p["out"]["bias"]

    from evr_tpu.models.siglip import _mha

    h = jnp.asarray(rng.normal(size=(2, 4, 32)).astype(np.float32))
    got = np.asarray(_mha(h, h, params["visual"]["blocks"][0]["attn"], 2, jnp.float32))
    want = np.asarray(mha_ref(h, h, params["visual"]["blocks"][0]["attn"], 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # cross-attention (probe) path too
    probe = jnp.asarray(rng.normal(size=(2, 1, 32)).astype(np.float32))
    got = np.asarray(_mha(probe, h, params["visual"]["blocks"][0]["attn"], 2, jnp.float32))
    want = np.asarray(mha_ref(probe, h, params["visual"]["blocks"][0]["attn"], 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert np.isfinite(feats).all()


def test_int8_ivf_composition(tiny_engine):
    """int8 towers + IVF probing compose: IVF search over int8 embeddings
    agrees with exact fp32 retrieval at honest nprobe."""
    from evr_tpu.index import FrameIndex
    from evr_tpu.models.quant import quantize_clip_params
    from evr_tpu.models.quant_gate import _encode_staged_with, _encode_texts_with

    staged = _synthetic_frames(n=96)
    params = tiny_engine.params
    qp = quantize_clip_params(params)
    e_fp = _encode_staged_with(tiny_engine, params, staged)
    e_q = _encode_staged_with(tiny_engine, qp, staged)
    queries = DEFAULT_GATE_QUERIES[:5]
    t_fp = _encode_texts_with(tiny_engine, params, queries)
    t_q = _encode_texts_with(tiny_engine, qp, queries)

    exact_top = np.argsort(-(e_fp @ t_fp.T), axis=0)[:10]
    idx = FrameIndex(
        embed_dim=64, search_impl="ivf", ivf_clusters=8, ivf_nprobe=8
    )
    idx.add_video("v", e_q)
    scores, rows = idx.search_raw(t_q, 10)
    for j in range(len(queries)):
        overlap = len(set(exact_top[:, j]) & set(np.asarray(rows)[j].tolist()))
        assert overlap >= 8, (j, overlap)


# -- boot-time auto gate -----------------------------------------------------


def test_set_params_dtype_promotion_and_guard(tiny_engine):
    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.models.quant import is_quantized_linear

    eng = EmbeddingEngine(cfg=tiny_engine.cfg, batch_size=4)
    eng.register_model("second", eng.params)
    eng.set_params_dtype("int8")
    for name in ("original", "second"):
        blk = eng.models[name]["clip"]["visual"]["blocks"][0]
        assert is_quantized_linear(blk["attn"]["qkv"]), name
    with pytest.raises(ValueError, match="cannot widen int8"):
        eng.set_params_dtype("float32")
    eng.set_params_dtype("int8")  # idempotent re-cast is fine


def test_auto_params_dtype_over_ingested_corpus(tmp_path, tiny_engine):
    cv2 = pytest.importorskip("cv2")

    from evr_tpu.config import DataRootConfig
    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.models.quant_gate import auto_params_dtype

    data_root = DataRootConfig(tmp_path / "data").ensure()
    frames_dir = pathlib.Path(data_root.frames_dir) / "vid"
    frames_dir.mkdir(parents=True)
    for i, frame in enumerate(_synthetic_frames(n=24)):
        cv2.imwrite(str(frames_dir / f"{i}.jpg"), frame[:, :, ::-1])

    staged = sample_corpus_frames(data_root, 64, limit=16)
    assert staged.shape == (16, 64, 64, 3)  # sampled from the real corpus

    eng = EmbeddingEngine(cfg=tiny_engine.cfg, batch_size=8)
    report = auto_params_dtype(eng, data_root, limit=16)
    # the engine's final format must FOLLOW the gate's verdict exactly
    assert eng.params_dtype == ("int8" if report.passed else "bfloat16")
    if report.passed:
        from evr_tpu.models.quant import is_quantized_linear

        assert is_quantized_linear(eng.params["visual"]["blocks"][0]["attn"]["qkv"])


def test_sample_corpus_frames_empty_root_synthetic(tmp_path):
    from evr_tpu.config import DataRootConfig

    data_root = DataRootConfig(tmp_path / "empty").ensure()
    staged = sample_corpus_frames(data_root, 32)
    assert staged.shape == (64, 32, 32, 3) and staged.dtype == np.uint8
