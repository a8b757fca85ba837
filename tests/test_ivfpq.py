"""IVF-PQ composed tier (`index/ivfpq.py`): score decomposition, recall
vs the plain tiers, residual advantage, re-rank exactness, coverage,
persistence."""

import numpy as np
import pytest

from evr_tpu.index.ivfpq import IVFPQIndex


def _normed(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _clustered(rng, n=2000, d=32, centers=24, noise=0.12):
    c = _normed(rng.standard_normal((centers, d)).astype(np.float32))
    a = rng.integers(0, centers, n)
    x = c[a] + noise * rng.standard_normal((n, d)).astype(np.float32)
    return _normed(x.astype(np.float32))


def _brute(emb, q, k):
    s = q @ emb.T
    rows = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, rows, axis=1), rows


def _queries(rng, emb, nq=16, noise=0.03):
    q = emb[rng.integers(0, len(emb), nq)] + noise * rng.standard_normal(
        (nq, emb.shape[1])
    ).astype(np.float32)
    return _normed(q.astype(np.float32))


def test_every_row_lives_exactly_once():
    rng = np.random.default_rng(0)
    emb = _clustered(rng, n=900, centers=12)
    idx = IVFPQIndex().build(
        emb, n_clusters=12, n_subspaces=4, capacity_factor=1.1
    )
    lists = np.asarray(idx.list_rows)
    placed = list(lists[lists >= 0]) + list(np.asarray(idx.overflow))
    assert sorted(placed) == list(range(900))
    assert int(idx.overflow.shape[0]) > 0  # tight capacity → real overflow
    assert np.asarray(idx.codes).dtype == np.uint8
    assert idx.code_bytes == 900 * 4


def test_adc_score_decomposition_tracks_exact():
    """ADC score = q·c + q·(residual code) must approximate q·x closely on
    clustered data (residual quantization is the whole point)."""
    rng = np.random.default_rng(1)
    emb = _clustered(rng, n=1500, centers=16)
    idx = IVFPQIndex().build(
        emb, n_clusters=16, n_subspaces=8, n_centroids=64, pq_iters=8
    )
    q = _queries(rng, emb)
    scores, rows = idx.search(q, 5, nprobe=16)
    exact = np.einsum("bd,brd->br", q, emb[np.where(rows >= 0, rows, 0)])
    err = np.abs(scores - exact)[rows >= 0]
    assert float(err.mean()) < 0.05


def test_full_probe_with_rerank_matches_brute_force():
    """nprobe = k covers every row; exact re-rank of enough candidates
    reproduces the brute-force top-k row set."""
    rng = np.random.default_rng(2)
    emb = _clustered(rng, n=1000, centers=10)
    idx = IVFPQIndex().build(
        emb, n_clusters=10, n_subspaces=4, n_centroids=64
    )
    q = _queries(rng, emb, nq=8)
    _, b_rows = _brute(emb, q, 5)
    scores, rows = idx.search(q, 5, nprobe=10, rerank=400)
    # re-ranked scores are exact cosines
    exp = np.einsum("bd,brd->br", q, emb[rows])
    np.testing.assert_allclose(scores, exp, rtol=1e-5, atol=1e-6)
    # strong overlap with brute top-5 (ADC pre-selection at rerank=400
    # recovers nearly everything on this corpus)
    overlap = sum(
        len(set(r.tolist()) & set(b.tolist())) for r, b in zip(rows, b_rows)
    ) / b_rows.size
    assert overlap >= 0.9


def test_probing_fewer_lists_is_monotone_and_useful():
    rng = np.random.default_rng(3)
    emb = _clustered(rng, n=2000, centers=24)
    idx = IVFPQIndex().build(
        emb, n_clusters=24, n_subspaces=8, n_centroids=64
    )
    q = _queries(rng, emb)
    _, b_rows = _brute(emb, q, 10)

    def recall(nprobe):
        _, rows = idx.search(q, 10, nprobe=nprobe, rerank=100)
        return sum(
            len(set(r.tolist()) & set(b.tolist()))
            for r, b in zip(rows, b_rows)
        ) / b_rows.size

    r4, r24 = recall(4), recall(24)
    assert r24 >= r4 - 1e-9
    assert r4 >= 0.5 and r24 >= 0.9


def test_residual_beats_raw_pq_reconstruction():
    """The residual quantizer's ADC error must beat raw-vector PQ at equal
    code budget — the reason IVF-PQ encodes residuals. This holds in the
    regime the composition exists for: corpus modes >> per-subspace
    centroid budget (here 150 modes vs 16 centroids), where the coarse
    quantizer absorbs the mode structure and the fine quantizer only has
    to cover the small residual ball. (With few modes raw PQ can place a
    centroid on every mode and genuinely wins — not this tier's regime.)"""
    from evr_tpu.index.pq import PQIndex

    rng = np.random.default_rng(4)
    emb = _clustered(rng, n=2000, centers=150, noise=0.03)
    q = _queries(rng, emb)

    ivfpq = IVFPQIndex().build(
        emb, n_clusters=150, n_subspaces=4, n_centroids=16, pq_iters=8
    )
    pq = PQIndex().build(emb, n_subspaces=4, n_centroids=16, iters=8)

    s1, r1 = ivfpq.search(q, 5, nprobe=150)
    s2, r2 = pq.search(q, 5)
    e1 = np.abs(
        s1 - np.einsum("bd,brd->br", q, emb[np.where(r1 >= 0, r1, 0)])
    )[r1 >= 0].mean()
    e2 = np.abs(s2 - np.einsum("bd,brd->br", q, emb[r2])).mean()
    assert float(e1) < float(e2)


def test_validation_and_lean_mode():
    rng = np.random.default_rng(5)
    emb = _normed(rng.standard_normal((100, 16)).astype(np.float32))
    with pytest.raises(ValueError, match="n_clusters"):
        IVFPQIndex().build(emb, n_clusters=101)
    with pytest.raises(ValueError, match="divisible"):
        IVFPQIndex().build(emb, n_clusters=4, n_subspaces=5)
    with pytest.raises(ValueError, match="before build"):
        IVFPQIndex().search(emb[:1], 3, nprobe=1)
    lean = IVFPQIndex().build(
        emb, n_clusters=4, n_subspaces=4, n_centroids=16,
        keep_originals=False,
    )
    with pytest.raises(ValueError, match="keep_originals"):
        lean.search(emb[:1], 3, nprobe=2, rerank=10)
    s, r = lean.search(emb[:1], 3, nprobe=2)  # ADC-only still works
    assert s.shape == r.shape == (1, 3)


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    emb = _clustered(rng, n=600, centers=8)
    idx = IVFPQIndex().build(emb, n_clusters=8, n_subspaces=4)
    q = _queries(rng, emb, nq=4)
    s0, r0 = idx.search(q, 5, nprobe=4, rerank=50)
    p = tmp_path / "ivfpq.npz"
    idx.save(p)
    idx2 = IVFPQIndex.load(p)
    s1, r1 = idx2.search(q, 5, nprobe=4, rerank=50)
    np.testing.assert_allclose(s1, s0, rtol=1e-6)
    np.testing.assert_array_equal(r1, r0)


# -- FrameIndex integration (search_impl="ivfpq") --------------------------


def test_frame_index_ivfpq_matches_exact_at_full_probe():
    from evr_tpu.index import FrameIndex

    rng = np.random.default_rng(20)

    def build(impl):
        idx = FrameIndex(
            embed_dim=16, pad_multiple=64, search_impl=impl,
            ivf_clusters=8, ivf_nprobe=8,
        )
        r = np.random.default_rng(20)
        for v in range(3):
            emb = _normed(r.standard_normal((80, 16)).astype(np.float32))
            idx.add_video(f"vid{v}", emb)
        return idx

    exact, ivfpq = build("xla"), build("ivfpq")
    q = _normed(rng.standard_normal((4, 16)).astype(np.float32))
    es, er = exact.search_raw(q, 5)
    s, r = ivfpq.search_raw(q, 5)
    # full probe + 4x exact re-rank on 240 rows covers everything
    np.testing.assert_array_equal(r, er)
    np.testing.assert_allclose(s, es, rtol=1e-5, atol=1e-5)
    # scoped search stays exact
    es2, er2 = exact.search_raw(q, 5, video_name="vid1")
    s2, r2 = ivfpq.search_raw(q, 5, video_name="vid1")
    np.testing.assert_array_equal(r2, er2)


def test_frame_index_ivfpq_rejects_int8():
    from evr_tpu.index import FrameIndex

    with pytest.raises(ValueError, match="float32/bfloat16"):
        FrameIndex(embed_dim=16, search_impl="ivfpq", device_dtype="int8")

    # ivfpq + mesh is a supported tier now (ShardedIVFPQIndex; exercised
    # end-to-end in tests/test_sharded_ann.py) — construction must succeed
    class FakeMesh:
        pass

    FrameIndex(embed_dim=16, search_impl="ivfpq", mesh=FakeMesh())


def test_query_engine_bypasses_fused_searcher_for_ivfpq():
    from evr_tpu.index import EmbeddingEngine, FrameIndex
    from evr_tpu.query import MetadataStore, QueryEngine
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig

    small = CLIPConfig(
        embed_dim=16,
        vision=VisionConfig(image_size=32, patch_size=16, width=32, layers=1, heads=2),
        text=TextConfig(width=32, layers=1, heads=2),
    )
    engine = EmbeddingEngine(cfg=small, batch_size=2)
    qe = QueryEngine(
        engine, FrameIndex(embed_dim=16, search_impl="ivfpq"), MetadataStore()
    )
    assert qe._searcher is None


def test_ivfpq_append_preserves_coverage_and_search():
    # one distribution split 800/120: appends must be same-distribution for
    # the frozen codebooks to encode their residuals well (the serving
    # case — new frames of the same embedding model/corpus)
    corpus = _clustered(np.random.default_rng(30), n=920, centers=10)
    emb, extra = corpus[:800], corpus[800:]
    idx = IVFPQIndex().build(
        emb, n_clusters=10, n_subspaces=4, n_centroids=64
    )
    new_ids = idx.append(extra)
    np.testing.assert_array_equal(new_ids, np.arange(800, 920))
    lists = np.asarray(idx.list_rows)
    placed = list(lists[lists >= 0]) + list(np.asarray(idx.overflow))
    assert sorted(placed) == list(range(920))
    assert idx.n_rows == 920
    # appended rows retrieve themselves at full probe with exact re-rank
    s, r = idx.search(extra[:5], 1, nprobe=10, rerank=200)
    full = np.concatenate([emb, extra], axis=0)
    exp = np.argmax(extra[:5] @ full.T, axis=1)
    np.testing.assert_array_equal(r[:, 0], exp)
    # appended codes encode with the existing books: ADC error stays small
    s2, r2 = idx.search(extra[:5], 1, nprobe=10)
    exact = np.einsum("bd,bd->b", extra[:5], full[r2[:, 0]])
    assert float(np.abs(s2[:, 0] - exact).mean()) < 0.1


def test_frame_index_ivfpq_upload_uses_incremental_append():
    from evr_tpu.index import FrameIndex

    rng = np.random.default_rng(40)
    idx = FrameIndex(
        embed_dim=16, pad_multiple=64, search_impl="ivfpq",
        ivf_clusters=6, ivf_nprobe=6,
    )
    for v in range(2):
        idx.add_video(f"vid{v}", _normed(
            rng.standard_normal((100, 16)).astype(np.float32)))
    idx.build()
    built = idx._ivf
    small = _normed(rng.standard_normal((40, 16)).astype(np.float32))
    idx.add_video("inc", small)
    assert idx._ivf is built  # append path, codebooks untouched
    hits = idx.search(small[:1], 1)
    assert hits[0][0].video == "inc"


def test_large_corpus_sampled_pq_training_exact_under_full_probe():
    """Round 5: past 131,072 rows the host build trains PQ codebooks on a
    strided sample and encodes in bounded chunks (the one-shot vmapped
    [S, N, K] transients OOMed a 16 GB chip at 1M rows). The exactness
    contract is layout-independent: full probe + deep rerank still
    reproduces brute force."""
    rng = np.random.default_rng(7)
    n = 140_000  # just past the sampling threshold
    emb = _normed(rng.standard_normal((n, 32)).astype(np.float32))
    idx = IVFPQIndex().build(
        emb, n_clusters=64, n_subspaces=16, n_centroids=64,
        coarse_iters=4, pq_iters=4,
    )
    assert idx.codes.shape == (n, 16)
    q = emb[[5, 777, 99_999]]
    _, r = idx.search(q, 5, nprobe=64, rerank=200)
    er = np.argsort(-(q @ emb.T), axis=1)[:, :5]
    np.testing.assert_array_equal(r, er)
