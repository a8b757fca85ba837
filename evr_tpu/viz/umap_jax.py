"""UMAP in JAX — the actual algorithm, device-accelerated.

Parity target: the reference's ``VisualizationService`` runs
``umap.UMAP(n_neighbors, min_dist, metric='cosine', random_state=42)``
(`Backend/services/visualization_service.py:125-235`). umap-learn (numba,
host CPU) is absent on this image, and earlier rounds served PCA/t-SNE
stand-ins; this module implements UMAP itself (McInnes et al. 2018,
arXiv:1802.03426) with the TPU mapping:

* kNN graph — one [N, D] @ [D, N] GEMM + ``lax.top_k`` (MXU-shaped; the
  same device top-k the retrieval tier uses);
* fuzzy simplicial set — per-row smooth-kNN calibration (rho = nearest
  distance, sigma bisected so Σ exp(-(d-rho)/sigma) = log2(k)) as a
  vectorised ``lax.scan`` bisection, then the probabilistic t-conorm
  symmetrisation ``W + Wᵀ − W∘Wᵀ``;
* spectral initialisation from the symmetric-normalised graph Laplacian;
* layout — negative-sampling SGD epochs in one jitted ``lax.scan``:
  instead of umap-learn's per-edge sequential updates (each edge sampled
  every 1/w epochs), every epoch applies ALL edges with gradients scaled
  by their membership weight — the exact expected gradient of the
  sampling scheme — gathered/scattered with ``segment_sum`` so an epoch
  is a handful of fused device ops over the [E]-edge arrays.

``n_neighbors`` and ``min_dist`` carry their real UMAP semantics: the
(a, b) output-kernel parameters are curve-fitted from min_dist/spread
exactly as umap-learn does.

Dense [N, N] intermediates bound practical N to ~20k points (same note
as ``tsne_jax``); the serving visualization works on hundreds-to-thousands
of frames.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def find_ab_params(spread: float = 1.0, min_dist: float = 0.1) -> tuple[float, float]:
    """Fit the differentiable output kernel 1/(1 + a·d^{2b}) to the target
    membership curve (1 for d ≤ min_dist, exp(-(d-min_dist)/spread) beyond)
    — umap-learn's ``find_ab_params`` procedure."""
    from scipy.optimize import curve_fit

    def curve(x, a, b):
        return 1.0 / (1.0 + a * x ** (2 * b))

    xv = np.linspace(0, spread * 3, 300)
    yv = np.zeros_like(xv)
    yv[xv < min_dist] = 1.0
    yv[xv >= min_dist] = np.exp(-(xv[xv >= min_dist] - min_dist) / spread)
    params, _ = curve_fit(curve, xv, yv)
    return float(params[0]), float(params[1])


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def knn_graph(x: jax.Array, k: int, metric: str = "cosine"):
    """Exact kNN via one GEMM + top_k. Returns (indices [N,k], dists [N,k]),
    self excluded, ascending distance. cosine distance = 1 − cosine sim."""
    if metric == "cosine":
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        d = 1.0 - xn @ xn.T
    else:  # euclidean (squared is rank-equivalent; report true distance)
        sq = jnp.sum(x * x, axis=1)
        d = jnp.sqrt(jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (x @ x.T), 0.0))
    n = d.shape[0]
    d = d + jnp.eye(n) * 1e9  # exclude self
    neg_d, idx = jax.lax.top_k(-d, k)
    return idx, jnp.maximum(-neg_d, 0.0)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def smooth_knn_weights(dists: jax.Array, n_iter: int = 64) -> jax.Array:
    """Per-row smooth-kNN calibration: rho_i = nearest distance, sigma_i
    bisected so Σ_j exp(-max(0, d_ij − rho_i)/sigma_i) = log2(k).
    Returns membership weights [N, k] in (0, 1]."""
    k = dists.shape[1]
    target = jnp.log2(jnp.asarray(float(k)))
    rho = dists[:, 0:1]
    adj = jnp.maximum(dists - rho, 0.0)

    def row_sum(sigma):
        return jnp.exp(-adj / sigma[:, None]).sum(axis=1)

    def body(state, _):
        sigma, lo, hi = state
        s = row_sum(sigma)
        too_high = s > target  # sum too large → shrink sigma
        hi = jnp.where(too_high, sigma, hi)
        lo = jnp.where(too_high, lo, sigma)
        sigma = jnp.where(jnp.isinf(hi), sigma * 2.0, (lo + hi) / 2.0)
        return (sigma, lo, hi), None

    n = dists.shape[0]
    init = (jnp.ones(n), jnp.zeros(n), jnp.full(n, jnp.inf))
    (sigma, _, _), _ = jax.lax.scan(body, init, None, length=n_iter)
    sigma = jnp.maximum(sigma, 1e-10)
    return jnp.exp(-adj / sigma[:, None])


def fuzzy_simplicial_set(x: np.ndarray, n_neighbors: int, metric: str = "cosine"):
    """Full graph construction. Returns the dense symmetrised membership
    matrix W [N, N] (probabilistic t-conorm of the directed weights)."""
    n = len(x)
    k = max(1, min(n_neighbors, n - 1))
    idx, dists = knn_graph(jnp.asarray(x, jnp.float32), k, metric=metric)
    w = smooth_knn_weights(dists)
    dense = jnp.zeros((n, n), jnp.float32)
    rows = jnp.repeat(jnp.arange(n), k)
    dense = dense.at[rows, idx.reshape(-1)].set(w.reshape(-1))
    sym = dense + dense.T - dense * dense.T
    return np.asarray(sym)


def spectral_init(w: np.ndarray, n_components: int = 2, random_state: int = 42):
    """Symmetric-normalised Laplacian eigenvectors 1..n_components (the
    smallest non-trivial), scaled to the ±10 box umap-learn initialises in;
    tiny seeded jitter breaks eigenvector ties."""
    n = len(w)
    deg = np.maximum(w.sum(axis=1), 1e-12)
    d_inv_sqrt = 1.0 / np.sqrt(deg)
    lap = np.eye(n) - (d_inv_sqrt[:, None] * w * d_inv_sqrt[None, :])
    _, vecs = np.linalg.eigh(lap.astype(np.float64))
    comps = min(n_components, max(1, n - 1))
    y = vecs[:, 1 : 1 + comps].astype(np.float32)
    if y.shape[1] < n_components:
        y = np.pad(y, ((0, 0), (0, n_components - y.shape[1])))
    scale = np.abs(y).max() or 1.0
    y = y / scale * 10.0
    rng = np.random.default_rng(random_state)
    return y + rng.normal(scale=1e-4, size=y.shape).astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("n_epochs", "negative_sample_rate")
)
def optimize_layout(
    y0: jax.Array,
    heads: jax.Array,
    tails: jax.Array,
    weights: jax.Array,
    key: jax.Array,
    a: float,
    b: float,
    n_epochs: int = 200,
    negative_sample_rate: int = 5,
    initial_alpha: float = 1.0,
) -> jax.Array:
    """Negative-sampling SGD layout as one jitted ``lax.scan``.

    Per epoch: attractive gradients on every edge scaled by its membership
    weight (the expected gradient of umap-learn's sample-every-1/w-epochs
    scheme, so the per-edge ±4 clip and the annealed learning rate carry
    over unchanged), plus ``negative_sample_rate`` uniform negatives per
    edge applied to the head point; both scattered with ``segment_sum``."""
    n, dim = y0.shape
    e = heads.shape[0]
    a = jnp.float32(a)
    b = jnp.float32(b)

    def attract_grad(yh, yt):
        d2 = jnp.sum((yh - yt) ** 2, axis=1, keepdims=True)
        # dCE/dy_h = (−2ab·d^{2(b−1)}) / (1 + a·d^{2b}) · (y_h − y_t)
        coef = (-2.0 * a * b * jnp.power(jnp.maximum(d2, 1e-12), b - 1.0)) / (
            1.0 + a * jnp.power(jnp.maximum(d2, 1e-12), b)
        )
        return jnp.clip(coef * (yh - yt), -4.0, 4.0)

    def repulse_grad(yh, yt):
        d2 = jnp.sum((yh - yt) ** 2, axis=1, keepdims=True)
        coef = (2.0 * b) / (
            (0.001 + d2) * (1.0 + a * jnp.power(jnp.maximum(d2, 1e-12), b))
        )
        return jnp.clip(coef * (yh - yt), -4.0, 4.0)

    def body(state, epoch):
        y, k = state
        alpha = initial_alpha * (1.0 - epoch / n_epochs)
        yh, yt = y[heads], y[tails]
        g_att = attract_grad(yh, yt) * weights[:, None]
        # move both ends (non-parametric umap moves head and tail)
        upd = jax.ops.segment_sum(g_att, heads, num_segments=n)
        upd = upd - jax.ops.segment_sum(g_att, tails, num_segments=n)

        k, sub = jax.random.split(k)
        neg = jax.random.randint(sub, (e, negative_sample_rate), 0, n)
        yn = y[neg]  # [E, R, dim]
        # repulsion pushes the HEAD away from each negative sample
        g_rep = jax.vmap(lambda yneg: repulse_grad(yh, yneg), in_axes=1, out_axes=1)(
            yn
        )
        g_rep = (g_rep.sum(axis=1)) * weights[:, None]
        upd = upd + jax.ops.segment_sum(g_rep, heads, num_segments=n)

        y = y + alpha * upd
        return (y, k), None

    (y, _), _ = jax.lax.scan(body, (y0, key), jnp.arange(n_epochs))
    return y - jnp.mean(y, axis=0, keepdims=True)


def umap(
    embeddings: np.ndarray,
    n_components: int = 2,
    n_neighbors: int = 15,
    min_dist: float = 0.1,
    spread: float = 1.0,
    metric: str = "cosine",
    n_epochs: int | None = None,
    negative_sample_rate: int = 5,
    random_state: int = 42,
) -> np.ndarray:
    """Device-accelerated UMAP. [N, D] → [N, n_components].

    ``n_epochs=None`` follows umap-learn's default: 500 epochs up to 10k
    points, 200 beyond."""
    x = np.asarray(embeddings, np.float32)
    n = len(x)
    if n <= 2:  # degenerate layouts: nothing to optimise
        return np.zeros((n, n_components), np.float32)
    if n_epochs is None:
        n_epochs = 500 if n <= 10_000 else 200
    a, b = find_ab_params(spread, min_dist)
    w = fuzzy_simplicial_set(x, n_neighbors, metric=metric)
    y0 = spectral_init(w, n_components, random_state)
    heads, tails = np.nonzero(w)
    weights = w[heads, tails].astype(np.float32)
    y = optimize_layout(
        jnp.asarray(y0),
        jnp.asarray(heads, jnp.int32),
        jnp.asarray(tails, jnp.int32),
        jnp.asarray(weights),
        jax.random.PRNGKey(random_state),
        a,
        b,
        n_epochs=n_epochs,
        negative_sample_rate=negative_sample_rate,
    )
    return np.asarray(y)
