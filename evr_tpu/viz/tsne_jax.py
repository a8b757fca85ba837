"""Exact t-SNE in JAX — device-accelerated 2-D projection.

The reference's visualization runs umap-learn on the host CPU (numba),
taking seconds-to-minutes at a few thousand frames (SURVEY.md §3.6 marks the
fit as the hot spot and caches it for 24 h). This is the TPU-native
alternative: exact (O(N²)) t-SNE with perplexity calibration by vectorised
bisection and a jitted `lax.scan` optimisation loop — the N² kernels are
MXU-shaped matmuls, so a 5k-frame layout fits in one short device program.
Exact t-SNE is practical to ~20k points (N² memory); beyond that, project a
sample or use the PCA path.

Used through ``viz.projection.project_embeddings(method="tsne_jax")``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def _pairwise_sq_dists(x: jax.Array) -> jax.Array:
    sq = jnp.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    return jnp.maximum(d2, 0.0)


def _calibrate_p(d2: jax.Array, perplexity: float, n_iter: int = 40) -> jax.Array:
    """Per-row bandwidths via bisection so each row's entropy == log(perp)."""
    n = d2.shape[0]
    target = jnp.log(perplexity)
    mask = 1.0 - jnp.eye(n)

    def row_entropy(beta):
        # beta: [N,1]; returns H [N], P [N,N]
        logits = -d2 * beta
        logits = jnp.where(mask > 0, logits, -jnp.inf)
        logp = jax.nn.log_softmax(logits, axis=1)
        p = jnp.exp(logp)
        h = -jnp.sum(jnp.where(p > 0, p * logp, 0.0), axis=1)
        return h, p

    def body(state, _):
        beta, lo, hi = state
        h, _ = row_entropy(beta[:, None])
        too_high = h > target  # entropy too high → increase beta
        lo = jnp.where(too_high, beta, lo)
        hi = jnp.where(too_high, hi, beta)
        beta = jnp.where(jnp.isinf(hi), beta * 2.0, (lo + hi) / 2.0)
        return (beta, lo, hi), None

    init = (jnp.ones(n), jnp.zeros(n), jnp.full(n, jnp.inf))
    (beta, _, _), _ = jax.lax.scan(body, init, None, length=n_iter)
    _, p = row_entropy(beta[:, None])
    p = (p + p.T) / (2.0 * n)
    return jnp.maximum(p, 1e-12)


@functools.partial(
    jax.jit, static_argnames=("n_iter", "exaggeration_iters")
)
def _tsne_optimize(
    p: jax.Array,
    y0: jax.Array,
    n_iter: int = 400,
    exaggeration_iters: int = 100,
    learning_rate: float = 100.0,
    momentum: float = 0.8,
    exaggeration: float = 12.0,
) -> jax.Array:
    n = p.shape[0]
    mask = 1.0 - jnp.eye(n)

    def grad_kl(y, p_eff):
        d2 = _pairwise_sq_dists(y)
        num = mask / (1.0 + d2)
        q = num / jnp.sum(num)
        q = jnp.maximum(q, 1e-12)
        pq = (p_eff - q) * num
        # dKL/dy_i = 4 Σ_j (p_ij - q_ij)(1+|y_i-y_j|²)^-1 (y_i - y_j)
        return 4.0 * (jnp.diag(jnp.sum(pq, axis=1)) - pq) @ y

    def body(state, i):
        y, vel = state
        p_eff = jnp.where(i < exaggeration_iters, p * exaggeration, p)
        g = grad_kl(y, p_eff)
        vel = momentum * vel - learning_rate * g
        y = y + vel
        y = y - jnp.mean(y, axis=0, keepdims=True)
        return (y, vel), None

    (y, _), _ = jax.lax.scan(body, (y0, jnp.zeros_like(y0)), jnp.arange(n_iter))
    return y


def tsne(
    embeddings: np.ndarray,
    n_components: int = 2,
    perplexity: float = 30.0,
    n_iter: int = 400,
    random_state: int = 42,
    metric: str = "cosine",
) -> np.ndarray:
    """Device-accelerated exact t-SNE. [N, D] → [N, n_components]."""
    x = np.asarray(embeddings, np.float32)
    if metric == "cosine":
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n = len(x)
    perplexity = min(perplexity, max(2.0, (n - 1) / 3))

    d2 = _pairwise_sq_dists(jnp.asarray(x))
    p = _calibrate_p(d2, perplexity)
    y0 = jnp.asarray(
        np.random.default_rng(random_state).normal(size=(n, n_components)) * 1e-2,
        jnp.float32,
    )
    y = _tsne_optimize(p, y0, n_iter=n_iter)
    return np.asarray(y)
