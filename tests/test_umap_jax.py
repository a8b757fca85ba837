"""Device-accelerated UMAP (viz/umap_jax.py).

Parity target: `Backend/services/visualization_service.py:125-235` —
``umap.UMAP(n_neighbors, min_dist, metric='cosine', random_state=42)``.
Property tests pin the algorithm pieces (kernel fit, smooth-kNN
calibration, t-conorm symmetrisation, min_dist semantics) and the quality
bar (trustworthiness beats the PCA fallback AND the t-SNE stand-in on
the real reference fixture embeddings)."""

import glob

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from evr_tpu.viz.umap_jax import (
    find_ab_params,
    fuzzy_simplicial_set,
    knn_graph,
    smooth_knn_weights,
    spectral_init,
    umap,
)


@pytest.fixture(scope="module")
def clusters():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(3, 32)) * 5
    x = np.concatenate([c + rng.normal(size=(60, 32)) for c in centers])
    labels = np.repeat(np.arange(3), 60)
    return x.astype(np.float32), labels


def test_ab_params_match_umap_learn_canonical_values():
    # umap-learn's documented fit for spread=1.0, min_dist=0.1
    a, b = find_ab_params(1.0, 0.1)
    assert a == pytest.approx(1.577, abs=0.01)
    assert b == pytest.approx(0.8951, abs=0.005)
    # min_dist semantics flow through the kernel: smaller min_dist → larger a
    a2, _ = find_ab_params(1.0, 0.01)
    assert a2 > a


def test_knn_graph_exact(clusters):
    x, _ = clusters
    idx, dists = map(np.asarray, knn_graph(x[:50], 5, metric="euclidean"))
    assert idx.shape == dists.shape == (50, 5)
    # ascending distances, no self edges
    assert (np.diff(dists, axis=1) >= -1e-5).all()
    assert not (idx == np.arange(50)[:, None]).any()
    # exactness vs brute force
    from scipy.spatial.distance import cdist

    d = cdist(x[:50], x[:50])
    np.fill_diagonal(d, np.inf)
    brute = np.argsort(d, axis=1)[:, :5]
    assert (np.sort(idx, axis=1) == np.sort(brute, axis=1)).mean() > 0.99


def test_smooth_knn_calibration(clusters):
    x, _ = clusters
    _, dists = knn_graph(jax.numpy.asarray(x), 15, metric="cosine")
    w = np.asarray(smooth_knn_weights(dists))
    assert w.shape == dists.shape
    assert (w > 0).all() and (w <= 1 + 1e-6).all()
    # nearest neighbour always gets membership 1 (d − rho = 0)
    assert np.allclose(w[:, 0], 1.0, atol=1e-5)
    # per-row sums hit the log2(k) target the bisection solves for
    assert np.allclose(w.sum(axis=1), np.log2(15), atol=0.05)


def test_fuzzy_set_symmetric_tconorm(clusters):
    x, _ = clusters
    w = fuzzy_simplicial_set(x[:80], 10, metric="cosine")
    assert w.shape == (80, 80)
    assert np.allclose(w, w.T, atol=1e-6)
    assert w.max() <= 1 + 1e-6 and w.min() >= 0
    assert np.allclose(np.diag(w), 0)


def test_spectral_init_shape_and_scale(clusters):
    x, _ = clusters
    w = fuzzy_simplicial_set(x[:60], 10)
    y = spectral_init(w, 2)
    assert y.shape == (60, 2)
    assert np.abs(y).max() <= 10.5


def test_layout_separates_clusters(clusters):
    x, labels = clusters
    y = umap(x, n_neighbors=15, min_dist=0.1, metric="euclidean", n_epochs=200)
    assert y.shape == (len(x), 2) and np.isfinite(y).all()
    from scipy.spatial.distance import cdist

    intra = np.mean([cdist(y[labels == i], y[labels == i]).mean() for i in range(3)])
    inter = np.mean(
        [
            cdist(y[labels == i], y[labels == j]).mean()
            for i in range(3)
            for j in range(3)
            if i != j
        ]
    )
    assert inter > 3 * intra, (intra, inter)


def test_min_dist_semantics(clusters):
    """Smaller min_dist packs neighbours tighter — the parameter's actual
    meaning, which the r1/r2 PCA/t-SNE stand-ins could not honour."""
    x, _ = clusters
    from scipy.spatial.distance import cdist

    def mean_nn(yv):
        d = cdist(yv, yv)
        np.fill_diagonal(d, np.inf)
        return d.min(axis=1).mean()

    tight = umap(x, min_dist=0.01, metric="euclidean", n_epochs=200)
    loose = umap(x, min_dist=0.99, metric="euclidean", n_epochs=200)
    assert mean_nn(tight) < mean_nn(loose)


def test_deterministic_given_seed(clusters):
    x, _ = clusters
    y1 = umap(x[:60], n_epochs=50, random_state=7)
    y2 = umap(x[:60], n_epochs=50, random_state=7)
    assert np.allclose(y1, y2)


def test_tiny_inputs_do_not_crash():
    assert umap(np.random.default_rng(0).normal(size=(2, 8))).shape == (2, 2)
    y = umap(np.random.default_rng(0).normal(size=(5, 8)), n_neighbors=15)
    assert y.shape == (5, 2) and np.isfinite(y).all()


def test_trustworthiness_beats_pca(clusters):
    from sklearn.decomposition import PCA
    from sklearn.manifold import trustworthiness

    x, _ = clusters
    y = umap(x, metric="euclidean")
    t_umap = trustworthiness(x, y, n_neighbors=10)
    t_pca = trustworthiness(x, PCA(2).fit_transform(x), n_neighbors=10)
    assert t_umap > t_pca, (t_umap, t_pca)
    assert t_umap > 0.85


@pytest.mark.skipif(
    not glob.glob("/root/reference/Backend/embedding/*.npy"),
    reason="reference fixture embeddings not mounted",
)
def test_fixture_trustworthiness_beats_tsne_and_pca():
    """VERDICT r2 #6 'done' bar: neighbour preservation beats the t-SNE
    fallback on the real fixture embeddings (measured r3: umap 0.917 vs
    tsne_jax 0.874 vs pca 0.789 at k=10 — PERF.md)."""
    from sklearn.decomposition import PCA
    from sklearn.manifold import trustworthiness

    from evr_tpu.viz.tsne_jax import tsne

    files = sorted(glob.glob("/root/reference/Backend/embedding/*.npy"))
    x = np.concatenate([np.load(f) for f in files]).astype(np.float32)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    y_umap = umap(x, metric="cosine")
    t_umap = trustworthiness(xn, y_umap, n_neighbors=10)
    t_tsne = trustworthiness(xn, tsne(x, metric="cosine"), n_neighbors=10)
    t_pca = trustworthiness(xn, PCA(2).fit_transform(xn), n_neighbors=10)
    assert t_umap > t_pca, (t_umap, t_pca)
    assert t_umap > t_tsne, (t_umap, t_tsne)


def test_project_embeddings_default_is_real_umap(clusters):
    from evr_tpu.viz.projection import project_embeddings

    x, _ = clusters
    coords, used = project_embeddings(x[:50], method="auto", n_neighbors=10)
    assert used == "umap"
    assert coords.shape == (50, 2) and np.isfinite(coords).all()
    coords2, used2 = project_embeddings(x[:50], method="umap", n_neighbors=10)
    assert used2 == "umap"
    # parameters actually reach the algorithm (determinism check)
    assert np.allclose(coords, coords2)


def test_sparse_edges_equal_dense_nonzero(clusters):
    """The serving-scale sparse tier (VERDICT r3 #7): COO construction
    must produce EXACTLY the dense symmetrised graph's edge set and
    weights — same math, no [N, N] anywhere."""
    from evr_tpu.viz.umap_jax import fuzzy_simplicial_set_edges

    x, _ = clusters
    w = fuzzy_simplicial_set(x, 15)
    h, t, ww = fuzzy_simplicial_set_edges(x, 15, chunk=64)
    dense = {(int(a), int(b)): float(w[a, b]) for a, b in zip(*np.nonzero(w))}
    sparse = {(int(a), int(b)): float(c) for a, b, c in zip(h, t, ww)}
    assert set(dense) == set(sparse)
    assert max(abs(dense[k] - sparse[k]) for k in dense) < 1e-5


def test_sparse_tier_layout_quality():
    """Past dense_threshold the sparse COO + PCA-init tier engages and
    still separates clusters (trustworthiness floor)."""
    from sklearn.manifold import trustworthiness

    rng = np.random.default_rng(1)
    centers = rng.normal(size=(6, 24)) * 5
    x = np.concatenate(
        [c + rng.normal(size=(120, 24)) for c in centers]
    ).astype(np.float32)
    y = umap(x, metric="euclidean", dense_threshold=100, n_epochs=150)
    assert y.shape == (720, 2)
    t = trustworthiness(x, y, n_neighbors=10)
    assert t > 0.8, t


def test_generate_visualization_point_cap():
    """Serving cap: past max_points the payload is deterministically
    stride-downsampled with metadata kept in lockstep and the response
    records downsampled_from."""
    from evr_tpu.index import FrameIndex
    from evr_tpu.query import MetadataStore
    from evr_tpu.viz.projection import generate_visualization

    rng = np.random.default_rng(2)
    n = 300
    emb = rng.normal(size=(n, 16)).astype(np.float32)
    index = FrameIndex(embed_dim=16, pad_multiple=32)
    index.add_video("v", emb, [f"{i}.jpg" for i in range(n)])
    store = MetadataStore()
    store.add_video(
        "v",
        [
            {
                "frameidx": i, "frameid": f"{i}.jpg",
                "video": "videos/v.mp4", "filepath": f"frames/{i}.jpg",
                "tags": [], "metadata": {},
                "text_detections": {"detections": []},
                "object_detections": {"detections": []},
            }
            for i in range(n)
        ],
        fps=25.0,
    )
    out = generate_visualization(
        index, store, method="pca", max_points=100
    )
    assert len(out["coordinates"]) == 100
    assert len(out["metadata"]) == 100
    assert len(out["video_labels"]) == 100
    assert out["dimensionality_reduction"]["downsampled_from"] == n
    assert [m["frame_id"] for m in out["metadata"]] == list(range(100))
    # deterministic stride keeps the first and last frames
    assert out["frame_indices"][0] == 0
    assert out["frame_indices"][-1] == n - 1
    # under the cap: no downsampling marker
    full = generate_visualization(index, store, method="pca", max_points=500)
    assert "downsampled_from" not in full["dimensionality_reduction"]
