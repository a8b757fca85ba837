"""Cosine top-k retrieval as one batched GEMM + lax.top_k.

Replaces the reference's ``np.dot`` + full ``np.argsort`` retrieval
(`Backend/services/embedding_service.py:314-341`) and its per-candidate
re-scoring loop (`query_strategies.py:157-161` recomputes single-row dots the
GEMV already produced): here scores come back *with* the indices, so
downstream confidence extraction is free.

The index is L2-normalised up front. Row-range masking ([start, end)) serves
two purposes: padding rows beyond the real frame count can never win, and a
per-video search is just the video's row interval — no separate per-video
matrices like the reference keeps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk(
    index: jax.Array,  # [N_padded, D], L2-normalised rows (float or int8)
    queries: jax.Array,  # [Q, D], unnormalised
    start: jax.Array,  # scalar int32 — first valid row
    end: jax.Array,  # scalar int32 — one past last valid row
    k: int,
    row_scales: jax.Array | None = None,  # [N_padded] dequant scales (int8 index)
) -> tuple[jax.Array, jax.Array]:
    """Return (scores [Q, k], indices [Q, k]) of top-k rows in [start, end).

    With an int8 index the per-row dequantisation scale factors out of the
    dot product, so it is applied AFTER the GEMM (exact, no dequantised
    matrix ever materialises); HBM reads are 4× smaller than fp32.
    """
    q = queries / jnp.maximum(jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
    if index.dtype == jnp.int8:
        sims = jnp.dot(
            q.astype(jnp.bfloat16),
            index.T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        sims = sims * row_scales[None, :]
    else:
        # match the index dtype (bf16 index → bf16 operands, fp32 accumulation)
        sims = jnp.dot(
            q.astype(index.dtype), index.T, preferred_element_type=jnp.float32
        )
    rows = jnp.arange(index.shape[0])[None, :]
    sims = jnp.where((rows >= start) & (rows < end), sims, -jnp.inf)
    return jax.lax.top_k(sims, k)


def merge_topk(
    scores: jax.Array,  # [S, Q, k] per-shard scores
    indices: jax.Array,  # [S, Q, k] per-shard *global* indices
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Merge per-shard top-k candidate lists into a global top-k.

    Exact: the global top-k is a subset of the union of per-shard top-ks, so
    concatenating S·k candidates and re-running top_k loses nothing.
    """
    S, Q, kk = scores.shape
    flat_scores = jnp.transpose(scores, (1, 0, 2)).reshape(Q, S * kk)
    flat_idx = jnp.transpose(indices, (1, 0, 2)).reshape(Q, S * kk)
    best, pos = jax.lax.top_k(flat_scores, k)
    return best, jnp.take_along_axis(flat_idx, pos, axis=1)
