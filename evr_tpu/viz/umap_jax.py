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


@functools.partial(jax.jit, static_argnames=("k", "chunk", "metric"))
def _knn_chunked(x, k: int, chunk: int, metric: str):
    """Exact kNN without the [N, N] distance matrix: a `lax.map` over
    query chunks, each one [chunk, N] GEMM + top_k — the 10k-100k serving
    tier where the dense graph (40 GB at 100k) cannot exist."""
    n = x.shape[0]
    if metric == "cosine":
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    else:
        xn = x
    sq = jnp.sum(xn * xn, axis=1)
    n_chunks = (n + chunk - 1) // chunk
    pad = n_chunks * chunk - n
    qpad = jnp.pad(xn, ((0, pad), (0, 0)))
    starts = jnp.arange(n_chunks) * chunk

    def one(start):
        q = jax.lax.dynamic_slice(qpad, (start, 0), (chunk, xn.shape[1]))
        if metric == "cosine":
            d = 1.0 - q @ xn.T
        else:
            qsq = jnp.sum(q * q, axis=1)
            d = jnp.sqrt(jnp.maximum(
                qsq[:, None] + sq[None, :] - 2.0 * (q @ xn.T), 0.0
            ))
        rows = start + jnp.arange(chunk)
        d = d + (rows[:, None] == jnp.arange(n)[None, :]) * 1e9  # self
        neg_d, idx = jax.lax.top_k(-d, k)
        return idx, jnp.maximum(-neg_d, 0.0)

    idx, dists = jax.lax.map(one, starts)
    return idx.reshape(-1, k)[:n], dists.reshape(-1, k)[:n]


def fuzzy_simplicial_set_edges(
    x: np.ndarray, n_neighbors: int, metric: str = "cosine",
    chunk: int = 2048,
):
    """Sparse COO construction of the same symmetrised membership graph as
    `fuzzy_simplicial_set` (probabilistic t-conorm w1 + w2 − w1·w2 on the
    directed kNN weights), without ever materialising [N, N]. Returns
    (heads [E], tails [E], weights [E]) covering BOTH directions of every
    edge — the exact edge set `np.nonzero(sym)` would produce."""
    n = len(x)
    k = max(1, min(n_neighbors, n - 1))
    idx, dists = _knn_chunked(
        jnp.asarray(x, jnp.float32), k, min(chunk, n), metric
    )
    w = np.asarray(smooth_knn_weights(dists)).reshape(-1)
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = np.asarray(idx, np.int64).reshape(-1)
    # collapse duplicate directed edges (keep max weight, matching the
    # dense .at[].set last-write — weights of duplicates are equal anyway)
    key = rows * n + cols
    order = np.argsort(key, kind="stable")
    key_s, rows_s, cols_s, w_s = key[order], rows[order], cols[order], w[order]
    first = np.ones(len(key_s), bool)
    first[1:] = key_s[1:] != key_s[:-1]
    key_u, a_u, b_u, w_u = key_s[first], rows_s[first], cols_s[first], w_s[first]
    # reverse lookup: weight of (b, a) in the directed set, 0 when absent
    rev_key = b_u * n + a_u
    pos = np.searchsorted(key_u, rev_key)
    pos_c = np.minimum(pos, len(key_u) - 1)
    has_rev = key_u[pos_c] == rev_key
    w_rev = np.where(has_rev, w_u[pos_c], 0.0)
    sym = w_u + w_rev - w_u * w_rev
    # union of both directions: every directed edge emits (a, b); edges
    # whose reverse was not a kNN edge also emit (b, a) with the same sym
    miss = ~has_rev
    heads = np.concatenate([a_u, b_u[miss]])
    tails = np.concatenate([b_u, a_u[miss]])
    weights = np.concatenate([sym, sym[miss]]).astype(np.float32)
    return heads.astype(np.int32), tails.astype(np.int32), weights


def pca_init(
    x: np.ndarray, n_components: int = 2, random_state: int = 42
) -> np.ndarray:
    """PCA initial layout for the sparse tier: the dense spectral init
    needs an [N, N] eigendecomposition (O(N³) — umap-learn switches to
    sparse solvers there; we switch to PCA, a standard init choice).
    Covariance is [D, D] so the cost is one GEMM + a small host eigh."""
    x = np.asarray(x, np.float32)
    mu = x.mean(axis=0, keepdims=True)
    xc = jnp.asarray(x - mu)
    cov = np.asarray(xc.T @ xc)                        # [D, D]
    _, vecs = np.linalg.eigh(cov.astype(np.float64))
    comps = vecs[:, -n_components:][:, ::-1].astype(np.float32)
    y = np.asarray(xc @ jnp.asarray(comps))
    scale = np.abs(y).max() or 1.0
    y = y / scale * 10.0
    rng = np.random.default_rng(random_state)
    return (y + rng.normal(scale=1e-4, size=y.shape)).astype(np.float32)



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
    dense_threshold: int = 4096,
) -> np.ndarray:
    """Device-accelerated UMAP. [N, D] → [N, n_components].

    ``n_epochs=None`` follows umap-learn's default: 500 epochs up to 10k
    points, 200 beyond. Above ``dense_threshold`` points the graph build
    switches from the dense [N, N] + spectral-init path (semantics locked
    vs umap-learn in tests) to the sparse COO + PCA-init tier that scales
    to 100k points (PERF.md §umap-scale); the layout optimiser — the part
    that defines the embedding — is the same jitted scan either way."""
    x = np.asarray(embeddings, np.float32)
    n = len(x)
    if n <= 2:  # degenerate layouts: nothing to optimise
        return np.zeros((n, n_components), np.float32)
    if n_epochs is None:
        n_epochs = 500 if n <= 10_000 else 200
    a, b = find_ab_params(spread, min_dist)
    if n <= dense_threshold:
        w = fuzzy_simplicial_set(x, n_neighbors, metric=metric)
        y0 = spectral_init(w, n_components, random_state)
        heads, tails = np.nonzero(w)
        weights = w[heads, tails].astype(np.float32)
    else:
        # serving-scale tier (10k-100k frames): sparse COO graph via the
        # chunked kNN (no [N, N] anywhere) + PCA init (no [N, N] eigh);
        # identical edge weights and identical layout optimiser
        heads, tails, weights = fuzzy_simplicial_set_edges(
            x, n_neighbors, metric=metric
        )
        y0 = pca_init(x, n_components, random_state)
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
