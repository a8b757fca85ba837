"""IVF ANN index: k-means invariants, exactness at nprobe=n_clusters,
overflow-pool completeness, recall curve on clustered data, persistence.
"""

import numpy as np
import pytest

import jax

from evr_tpu.index.ivf import IVFIndex, kmeans


def _normed(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _clustered_corpus(rng, n=1200, d=32, n_centers=24):
    centers = _normed(rng.standard_normal((n_centers, d)).astype(np.float32))
    assign = rng.integers(0, n_centers, n)
    x = centers[assign] + 0.15 * rng.standard_normal((n, d)).astype(np.float32)
    return _normed(x.astype(np.float32))


def _brute(emb, q, k):
    scores = q @ emb.T
    rows = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, rows, axis=1), rows


def test_kmeans_shapes_and_normalisation():
    rng = np.random.default_rng(0)
    x = _normed(rng.standard_normal((300, 16)).astype(np.float32))
    cents, assign = kmeans(jax.random.PRNGKey(0), x, 8, iters=5)
    assert cents.shape == (8, 16) and assign.shape == (300,)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(cents), axis=1), 1.0, rtol=1e-5
    )
    assert set(np.asarray(assign)) <= set(range(8))
    # assignments are the argmax of the returned centroids
    expected = np.argmax(x @ np.asarray(cents).T, axis=1)
    np.testing.assert_array_equal(np.asarray(assign), expected)


def test_full_probe_matches_brute_force():
    """nprobe = n_clusters covers every row (lists + overflow) → exact."""
    rng = np.random.default_rng(1)
    emb = _clustered_corpus(rng, n=600, d=16, n_centers=12)
    idx = IVFIndex().build(emb, n_clusters=12, capacity_factor=1.2, seed=0)
    # capacity_factor 1.2 on clustered data guarantees a non-trivial overflow
    assert int(idx.overflow.shape[0]) > 0
    q = _normed(rng.standard_normal((5, 16)).astype(np.float32))
    b_scores, b_rows = _brute(emb, q, 10)
    scores, rows = idx.search(q, 10, nprobe=12)
    np.testing.assert_allclose(scores, b_scores, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(rows, b_rows)


def test_every_row_lives_exactly_once():
    rng = np.random.default_rng(2)
    emb = _clustered_corpus(rng, n=500, d=16, n_centers=10)
    idx = IVFIndex().build(emb, n_clusters=10, capacity_factor=1.1)
    lists = np.asarray(idx.list_rows)
    placed = list(lists[lists >= 0]) + list(np.asarray(idx.overflow))
    assert sorted(placed) == list(range(500))


def test_recall_curve_on_clustered_data():
    rng = np.random.default_rng(3)
    emb = _clustered_corpus(rng, n=2000, d=32, n_centers=24)
    idx = IVFIndex().build(emb, n_clusters=24, capacity_factor=1.5, seed=1)
    # queries near corpus points (the retrieval regime)
    q = _normed(
        emb[rng.integers(0, 2000, 16)]
        + 0.05 * rng.standard_normal((16, 32)).astype(np.float32)
    )
    _, b_rows = _brute(emb, q, 10)

    def recall(nprobe):
        _, rows = idx.search(q, 10, nprobe=nprobe)
        hits = sum(
            len(set(r.tolist()) & set(b.tolist())) for r, b in zip(rows, b_rows)
        )
        return hits / b_rows.size

    r4, r12, r24 = recall(4), recall(12), recall(24)
    assert r24 == 1.0               # full probe is exact
    assert r12 >= r4 - 1e-9         # monotone in nprobe
    assert r12 >= 0.9               # half the clusters ≈ near-exact here
    assert r4 >= 0.5


def test_padding_and_small_k_edge_cases():
    rng = np.random.default_rng(4)
    emb = _normed(rng.standard_normal((40, 8)).astype(np.float32))
    idx = IVFIndex().build(emb, n_clusters=8, capacity_factor=1.0)
    # nprobe=1 with tiny lists: requested k may exceed reachable candidates
    scores, rows = idx.search(emb[:2], 20, nprobe=1)
    assert scores.shape == rows.shape
    # unreachable slots are masked (-inf score, row -1)
    assert ((rows >= 0) == np.isfinite(scores)).all()
    # the query's own row is always reachable under nprobe>=1? Not guaranteed
    # (capacity overflow), but the top hit must be a real row
    assert (rows[:, 0] >= 0).all()
    # single query, 1-D input
    s1, r1 = idx.search(emb[0], 5, nprobe=8)
    assert s1.shape == (1, 5)
    assert r1[0, 0] == 0 and s1[0, 0] == pytest.approx(1.0, abs=1e-5)


def test_build_validation_and_search_before_build():
    rng = np.random.default_rng(5)
    emb = _normed(rng.standard_normal((10, 4)).astype(np.float32))
    with pytest.raises(ValueError, match="n_clusters"):
        IVFIndex().build(emb, n_clusters=11)
    with pytest.raises(ValueError, match="before build"):
        IVFIndex().search(emb[:1], 3, nprobe=1)


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    emb = _clustered_corpus(rng, n=300, d=16, n_centers=6)
    idx = IVFIndex().build(emb, n_clusters=6)
    q = _normed(rng.standard_normal((3, 16)).astype(np.float32))
    s0, r0 = idx.search(q, 5, nprobe=3)
    path = tmp_path / "ivf.npz"
    idx.save(path)
    idx2 = IVFIndex.load(path)
    s1, r1 = idx2.search(q, 5, nprobe=3)
    np.testing.assert_allclose(s1, s0, rtol=1e-6)
    np.testing.assert_array_equal(r1, r0)

# -- FrameIndex integration (search_impl="ivf") ---------------------------


def _frame_index(impl="ivf", **kw):
    from evr_tpu.index import FrameIndex

    return FrameIndex(embed_dim=16, pad_multiple=64, search_impl=impl, **kw)


def _add_corpus(idx, rng, n_videos=3, frames=120):
    for v in range(n_videos):
        emb = _normed(
            rng.standard_normal((frames, 16)).astype(np.float32)
        )
        idx.add_video(f"vid{v}", emb)


def test_frame_index_ivf_full_probe_matches_exact_impl():
    """FrameIndex(search_impl='ivf') with nprobe >= n_clusters returns the
    same rows/scores as the exact XLA impl on the same corpus."""
    rng = np.random.default_rng(10)
    exact = _frame_index("xla")
    ivf = _frame_index("ivf", ivf_clusters=8, ivf_nprobe=8)
    _add_corpus(exact, np.random.default_rng(10))
    _add_corpus(ivf, np.random.default_rng(10))
    q = _normed(rng.standard_normal((4, 16)).astype(np.float32))
    es, er = exact.search_raw(q, 7)
    s, r = ivf.search_raw(q, 7)
    np.testing.assert_array_equal(r, er)
    np.testing.assert_allclose(s, es, rtol=1e-5, atol=1e-6)


def test_frame_index_ivf_scoped_search_is_exact():
    """Video-scoped searches bypass IVF (exact path) — identical to xla."""
    rng = np.random.default_rng(11)
    exact = _frame_index("xla")
    ivf = _frame_index("ivf", ivf_clusters=8, ivf_nprobe=1)  # tiny nprobe
    _add_corpus(exact, np.random.default_rng(11))
    _add_corpus(ivf, np.random.default_rng(11))
    q = _normed(rng.standard_normal((2, 16)).astype(np.float32))
    es, er = exact.search_raw(q, 5, video_name="vid1")
    s, r = ivf.search_raw(q, 5, video_name="vid1")
    np.testing.assert_array_equal(r, er)
    np.testing.assert_allclose(s, es, rtol=1e-5, atol=1e-6)


def test_frame_index_ivf_upload_after_build_is_searchable():
    """add_video after build() keeps new rows probe-reachable (via the
    incremental append path, or a rebuild when it outgrows the bound)."""
    rng = np.random.default_rng(12)
    idx = _frame_index("ivf", ivf_clusters=6, ivf_nprobe=6)
    _add_corpus(idx, rng, n_videos=2)
    idx.build()
    new = _normed(rng.standard_normal((50, 16)).astype(np.float32))
    idx.add_video("late", new)
    hits = idx.search(new[:1], 1)
    assert hits[0][0].video == "late" and hits[0][0].frame_index == 0


def test_frame_index_ivf_search_hits_resolve():
    """SearchHit resolution works through the IVF path (finite scores only)."""
    rng = np.random.default_rng(13)
    idx = _frame_index("ivf", ivf_clusters=6, ivf_nprobe=2)
    _add_corpus(idx, rng)
    q = _normed(rng.standard_normal((1, 16)).astype(np.float32))
    hits = idx.search(q, 5)[0]
    assert 1 <= len(hits) <= 5
    for h in hits:
        assert h.video in ("vid0", "vid1", "vid2")
        assert np.isfinite(h.score)


def test_frame_index_ivf_mesh_and_int8_rules():
    """ivf+mesh and ivfpq+mesh are supported tiers (parallel/sharded_ann —
    exercised in tests/test_sharded_ann.py); ivf+mesh+int8 stays
    rejected."""
    import pytest as _pytest

    class FakeMesh:  # rejected combinations must fail before mesh use
        pass

    _frame_index("ivfpq", mesh=FakeMesh())  # accepted since late round 4
    with _pytest.raises(ValueError, match="float32/bfloat16"):
        _frame_index("ivf", mesh=FakeMesh(), device_dtype="int8")

    # int8 IVF storage is a supported tier (4× less HBM, exact per-row
    # dequant at score time); ivfpq keeps the rejection since PQ already
    # compresses below int8.
    rng = np.random.default_rng(21)
    idx = _frame_index(
        "ivf", device_dtype="int8", ivf_clusters=6, ivf_nprobe=6
    )
    _add_corpus(idx, rng, n_videos=1, frames=100)
    emb = idx.get_embeddings("vid0")
    s, r = idx.search_raw(emb[:8], 1)
    np.testing.assert_array_equal(r[:, 0], np.arange(8))

    with _pytest.raises(ValueError, match="float32/bfloat16"):
        _frame_index("ivfpq", device_dtype="int8")


def test_frame_index_ivf_bfloat16_storage_ranks_sanely():
    """bf16 IVF storage: full probe still finds each row's own query."""
    rng = np.random.default_rng(14)
    idx = _frame_index(
        "ivf", device_dtype="bfloat16", ivf_clusters=6, ivf_nprobe=6
    )
    _add_corpus(idx, rng, n_videos=1, frames=100)
    emb = idx.get_embeddings("vid0")
    s, r = idx.search_raw(emb[:8], 1)
    np.testing.assert_array_equal(r[:, 0], np.arange(8))


def test_query_engine_routes_around_fused_searcher_for_ivf():
    """A full-interface engine normally gets the fused TextSearcher; with an
    IVF index the QueryEngine must use FrameIndex.search so probes happen."""
    import jax
    from evr_tpu.index import EmbeddingEngine, FrameIndex
    from evr_tpu.query import MetadataStore, QueryEngine
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig

    small = CLIPConfig(
        embed_dim=16,
        vision=VisionConfig(image_size=32, patch_size=16, width=32, layers=1, heads=2),
        text=TextConfig(width=32, layers=1, heads=2),
    )
    engine = EmbeddingEngine(cfg=small, batch_size=2)
    exact = QueryEngine(engine, FrameIndex(embed_dim=16), MetadataStore())
    assert exact._searcher is not None
    ivf = QueryEngine(
        engine, FrameIndex(embed_dim=16, search_impl="ivf"), MetadataStore()
    )
    assert ivf._searcher is None


def test_query_text_clip_through_ivf_index():
    """End-to-end strategy query over an IVF index finds the aligned frame."""
    from evr_tpu.query import MetadataStore, QueryEngine

    from tests.test_query import FakeEngine, _frame

    dim = 16
    fake = FakeEngine(dim)
    fake.register("fight", 1)
    rng = np.random.default_rng(20)
    emb = _normed(0.1 * rng.standard_normal((64, dim)).astype(np.float32))
    emb[7] = 0.0
    emb[7, 1] = 1.0  # frame 7 aligned with "fight"
    from evr_tpu.index import FrameIndex

    idx = FrameIndex(
        embed_dim=dim, pad_multiple=64, search_impl="ivf",
        ivf_clusters=8, ivf_nprobe=8,
    )
    idx.add_video("testvid", emb, [f"{i}.jpg" for i in range(64)])
    store = MetadataStore()
    store.add_video("testvid", [_frame(i) for i in range(64)])
    qe = QueryEngine(fake, idx, store)
    events = qe.query_text_clip("fight", top_k=3)
    assert events and events[0]["id"] == "event-7"
    assert events[0]["clip_similarity"] == pytest.approx(1.0, abs=1e-5)


# -- incremental append ----------------------------------------------------


def test_ivf_append_preserves_exactness_and_coverage():
    """append() assigns to existing centroids without k-means; the
    every-row-once invariant and the nprobe=k exactness ceiling hold."""
    emb = _clustered_corpus(np.random.default_rng(30), n=500, d=16, n_centers=10)
    idx = IVFIndex().build(emb, n_clusters=10, capacity_factor=1.3)
    extra = _normed(np.random.default_rng(31).standard_normal((80, 16)).astype(np.float32))
    new_ids = idx.append(extra)
    np.testing.assert_array_equal(new_ids, np.arange(500, 580))
    # coverage: every row (old + new) lives in exactly one place
    lists = np.asarray(idx.list_rows)
    placed = list(lists[lists >= 0]) + list(np.asarray(idx.overflow))
    assert sorted(placed) == list(range(580))
    # full probe == brute force over the grown corpus
    full = np.concatenate([emb, extra], axis=0)
    q = _normed(np.random.default_rng(32).standard_normal((5, 16)).astype(np.float32))
    b_scores, b_rows = _brute(full, q, 10)
    scores, rows = idx.search(q, 10, nprobe=10)
    np.testing.assert_array_equal(rows, b_rows)
    np.testing.assert_allclose(scores, b_scores, rtol=1e-5, atol=1e-6)


def test_ivf_append_validation():
    rng = np.random.default_rng(33)
    with pytest.raises(ValueError, match="before build"):
        IVFIndex().append(rng.standard_normal((3, 8)).astype(np.float32))
    emb = _normed(rng.standard_normal((50, 8)).astype(np.float32))
    idx = IVFIndex().build(emb, n_clusters=5)
    with pytest.raises(ValueError, match="append rows"):
        idx.append(rng.standard_normal((3, 9)).astype(np.float32))


def test_frame_index_ivf_upload_uses_incremental_append():
    """Post-build uploads within 1.5x of the built corpus take the
    in-place path (version bumps WITHOUT a rebuild) and stay searchable;
    outgrowing the bound forces the k-means rebuild."""
    rng = np.random.default_rng(34)
    idx = _frame_index("ivf", ivf_clusters=6, ivf_nprobe=6)
    _add_corpus(idx, rng, n_videos=2)
    idx.build()
    built = idx._ivf
    small = _normed(rng.standard_normal((40, 16)).astype(np.float32))
    idx.add_video("inc", small)
    assert idx._ivf is built  # same IVF object → append path, no rebuild
    hits = idx.search(small[:1], 1)
    assert hits[0][0].video == "inc"
    # a huge upload (beyond 1.5x) falls back to the rebuild path
    big = _normed(rng.standard_normal((400, 16)).astype(np.float32))
    idx.add_video("big", big)
    hits = idx.search(big[:1], 1)
    assert hits[0][0].video == "big"
    assert idx._ivf is not built  # rebuilt with fresh k-means


def test_serving_context_plumbs_ivf_knobs():
    """ServingContext(search_impl='ivf', ivf_nprobe=, ivf_clusters=) reaches
    the per-model FrameIndex (CLI flags --search-impl/--ivf-nprobe/...)."""
    import tempfile

    from evr_tpu.serving.context import ServingContext

    class StubEngine:
        class cfg:
            embed_dim = 16

        active_model = "original"

    ctx = ServingContext(
        tempfile.mkdtemp(), engine=StubEngine(),
        search_impl="ivf", ivf_nprobe=7, ivf_clusters=9,
    )
    idx = ctx.index_for("original")
    assert idx.search_impl == "ivf"
    assert idx.ivf_nprobe == 7 and idx.ivf_clusters == 9


def test_serving_context_rejects_invalid_tier_combos_at_boot():
    """ivfpq + int8 must fail at construction, not 500 on the first
    request (per-model indexes build lazily)."""
    import tempfile

    from evr_tpu.serving.context import ServingContext

    class StubEngine:
        class cfg:
            embed_dim = 16

        active_model = "original"

    with pytest.raises(ValueError, match="float32/bfloat16"):
        ServingContext(
            tempfile.mkdtemp(), engine=StubEngine(),
            search_impl="ivfpq", index_dtype="int8",
        )
