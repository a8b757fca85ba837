"""JAX t-SNE: cluster structure preservation on synthetic blobs."""

import numpy as np

from evr_tpu.viz.tsne_jax import tsne


def test_tsne_separates_clusters(rng):
    # three well-separated 16-d blobs
    centers = np.eye(3, 16) * 8
    labels = np.repeat(np.arange(3), 40)
    x = centers[labels] + rng.normal(size=(120, 16)) * 0.3
    y = tsne(x.astype(np.float32), perplexity=15, n_iter=300, metric="euclidean")
    assert y.shape == (120, 2)
    assert np.isfinite(y).all()

    # intra-cluster distances must be much smaller than inter-cluster
    def mean_dist(a, b):
        return float(np.linalg.norm(a[:, None] - b[None, :], axis=-1).mean())

    intra = np.mean([mean_dist(y[labels == c], y[labels == c]) for c in range(3)])
    inter = np.mean(
        [mean_dist(y[labels == a], y[labels == b]) for a in range(3) for b in range(3) if a != b]
    )
    assert inter > 2.0 * intra, (intra, inter)

    # 1-NN purity in the embedding
    d = np.linalg.norm(y[:, None] - y[None, :], axis=-1) + np.eye(120) * 1e9
    nn = d.argmin(axis=1)
    purity = float((labels[nn] == labels).mean())
    assert purity > 0.9, purity


def test_tsne_via_projection_api(rng):
    from evr_tpu.viz.projection import project_embeddings

    x = rng.normal(size=(50, 12)).astype(np.float32)
    coords, used = project_embeddings(x, method="tsne_jax", n_components=2)
    assert used == "tsne_jax"
    assert coords.shape == (50, 2)
    # deterministic under the same seed
    coords2, _ = project_embeddings(x, method="tsne_jax", n_components=2)
    np.testing.assert_allclose(coords, coords2, rtol=1e-5, atol=1e-6)
