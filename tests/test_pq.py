"""PQ memory-tier index (`index/pq.py`): per-subspace k-means invariants,
perfect-quantization exactness, recall/re-rank behavior, reconstruction,
compression accounting, persistence."""

import numpy as np
import pytest

import jax

from evr_tpu.index.pq import PQIndex, kmeans_l2


def _normed(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _clustered(rng, n=1500, d=32, centers=20, noise=0.12):
    c = _normed(rng.standard_normal((centers, d)).astype(np.float32))
    a = rng.integers(0, centers, n)
    x = c[a] + noise * rng.standard_normal((n, d)).astype(np.float32)
    return _normed(x.astype(np.float32))


def _brute(emb, q, k):
    s = q @ emb.T
    rows = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, rows, axis=1), rows


def test_kmeans_l2_assignment_is_nearest_centroid():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((400, 8)).astype(np.float32)
    cents, assign = kmeans_l2(jax.random.PRNGKey(0), x, 16, iters=6)
    cents, assign = np.asarray(cents), np.asarray(assign)
    d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(assign, np.argmin(d, axis=1))


def test_kmeans_l2_objective_decreases():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((600, 8)).astype(np.float32)

    def obj(iters):
        cents, assign = kmeans_l2(jax.random.PRNGKey(0), x, 12, iters=iters)
        cents, assign = np.asarray(cents), np.asarray(assign)
        return float(((x - cents[assign]) ** 2).sum())

    assert obj(8) <= obj(1) + 1e-3


def test_perfect_quantization_matches_brute_force():
    """K = N distinct rows per subspace → codes reconstruct exactly →
    ADC scores equal the exact GEMM."""
    rng = np.random.default_rng(2)
    emb = _normed(rng.standard_normal((48, 16)).astype(np.float32))
    idx = PQIndex().build(emb, n_subspaces=4, n_centroids=48, iters=25)
    q = _normed(rng.standard_normal((5, 16)).astype(np.float32))
    b_scores, b_rows = _brute(emb, q, 5)
    scores, rows = idx.search(q, 5)
    # quantization error may leave duplicate-centroid collisions; require
    # score agreement rather than bit-identical rows
    np.testing.assert_allclose(scores, b_scores, rtol=1e-3, atol=1e-3)


def test_recall_and_rerank_on_clustered_data():
    rng = np.random.default_rng(3)
    emb = _clustered(rng)
    idx = PQIndex().build(emb, n_subspaces=8, n_centroids=64, iters=8)
    q = _normed(
        emb[rng.integers(0, len(emb), 16)]
        + 0.03 * rng.standard_normal((16, emb.shape[1])).astype(np.float32)
    )
    _, b_rows = _brute(emb, q, 10)

    def recall(rows):
        hits = sum(
            len(set(r.tolist()) & set(b.tolist())) for r, b in zip(rows, b_rows)
        )
        return hits / b_rows.size

    _, adc_rows = idx.search(q, 10)
    r_adc = recall(adc_rows)
    assert r_adc >= 0.5  # raw ADC is a coarse approximation

    re_scores, re_rows = idx.search(q, 10, rerank=100)
    r_re = recall(re_rows)
    assert r_re >= r_adc - 1e-9
    assert r_re >= 0.9  # exact re-rank of 100 candidates recovers recall
    # re-ranked scores are exact cosines of the returned rows
    expected = np.einsum("bd,brd->br", q, emb[re_rows])
    np.testing.assert_allclose(re_scores, expected, rtol=1e-5, atol=1e-6)


def test_reconstruct_error_shrinks_with_more_centroids():
    rng = np.random.default_rng(4)
    emb = _clustered(rng, n=800, d=16, centers=10)

    def mse(k):
        idx = PQIndex().build(emb, n_subspaces=4, n_centroids=k, iters=8)
        rec = idx.reconstruct(np.arange(len(emb)))
        return float(((rec - emb) ** 2).mean())

    assert mse(64) < mse(4)


def test_compression_accounting_and_validation():
    rng = np.random.default_rng(5)
    emb = _normed(rng.standard_normal((300, 32)).astype(np.float32))
    idx = PQIndex().build(emb, n_subspaces=8, n_centroids=32)
    assert np.asarray(idx.codes).dtype == np.uint8
    assert idx.code_bytes == 300 * 8  # 16x smaller than fp32 rows
    with pytest.raises(ValueError, match="divisible"):
        PQIndex().build(emb, n_subspaces=5)
    with pytest.raises(ValueError, match="uint8"):
        PQIndex().build(emb, n_subspaces=8, n_centroids=300)
    with pytest.raises(ValueError, match="before build"):
        PQIndex().search(emb[:1], 3)
    lean = PQIndex().build(emb, n_subspaces=8, n_centroids=16,
                           keep_originals=False)
    with pytest.raises(ValueError, match="keep_originals"):
        lean.search(emb[:1], 3, rerank=10)


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    emb = _clustered(rng, n=400, d=16, centers=8)
    idx = PQIndex().build(emb, n_subspaces=4, n_centroids=32)
    q = _normed(rng.standard_normal((3, 16)).astype(np.float32))
    s0, r0 = idx.search(q, 5, rerank=50)
    p = tmp_path / "pq.npz"
    idx.save(p)
    idx2 = PQIndex.load(p)
    s1, r1 = idx2.search(q, 5, rerank=50)
    np.testing.assert_allclose(s1, s0, rtol=1e-6)
    np.testing.assert_array_equal(r1, r0)


# -- OPQ (learned rotation) ------------------------------------------------


def _correlated(rng, n=1200, d=16):
    """Anisotropic corpus: heavy cross-dimension correlation, the case a
    naive column split quantizes badly and a learned rotation fixes."""
    z = _clustered(rng, n=n, d=d, centers=12, noise=0.25)
    mix = rng.standard_normal((d, d)).astype(np.float32)
    mix += 3.0 * np.diag(rng.random(d).astype(np.float32))
    x = z @ mix
    return _normed(x.astype(np.float32))


def test_opq_rotation_is_orthogonal_and_improves_reconstruction():
    rng = np.random.default_rng(10)
    emb = _correlated(rng)
    plain = PQIndex().build(emb, n_subspaces=4, n_centroids=16, iters=8)
    opq = PQIndex().build(
        emb, n_subspaces=4, n_centroids=16, iters=8, opq_iters=5
    )
    rot = np.asarray(opq.rotation)
    np.testing.assert_allclose(rot @ rot.T, np.eye(16), atol=1e-4)

    def mse(idx):
        rec = idx.reconstruct(np.arange(len(emb)))
        return float(((rec - emb) ** 2).mean())

    assert mse(opq) < mse(plain)


def test_opq_search_scores_track_exact():
    rng = np.random.default_rng(11)
    emb = _correlated(rng)
    idx = PQIndex().build(
        emb, n_subspaces=4, n_centroids=64, iters=8, opq_iters=3
    )
    q = _normed(
        emb[rng.integers(0, len(emb), 8)]
        + 0.02 * rng.standard_normal((8, 16)).astype(np.float32)
    )
    scores, rows = idx.search(q, 5)
    exact = np.einsum("bd,brd->br", q, emb[rows])
    assert float(np.abs(scores - exact).mean()) < 0.08
    # re-rank path is rotation-agnostic (exact cosines of originals)
    rs, rr = idx.search(q, 5, rerank=100)
    np.testing.assert_allclose(
        rs, np.einsum("bd,brd->br", q, emb[rr]), rtol=1e-5, atol=1e-6
    )


def test_opq_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(12)
    emb = _correlated(rng, n=500)
    idx = PQIndex().build(
        emb, n_subspaces=4, n_centroids=32, opq_iters=2
    )
    q = _normed(rng.standard_normal((3, 16)).astype(np.float32))
    s0, r0 = idx.search(q, 5)
    p = tmp_path / "opq.npz"
    idx.save(p)
    idx2 = PQIndex.load(p)
    assert idx2.rotation is not None
    s1, r1 = idx2.search(q, 5)
    np.testing.assert_allclose(s1, s0, rtol=1e-6)
    np.testing.assert_array_equal(r1, r0)
