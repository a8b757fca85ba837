"""GradCache: exact-gradient contrastive training at batch sizes whose
activations don't fit in HBM (arXiv 2101.06983).

Contrastive quality scales with the in-batch negative pool, but a B-example
encoder forward stores O(B · depth · T · W) activations for the backward.
GradCache removes that coupling with two passes over C chunks:

1. **Feature pass** — encode every chunk inside a ``lax.scan`` (each
   iteration's activations are freed when it ends; nothing is saved for a
   backward), collecting only the [B, D] embedding matrices.
2. **Head grad** — differentiate the loss w.r.t. the embeddings (and the
   loss-side params: logit_scale/logit_bias/classifier). The [B, B] logit
   matrix plus [B, D] features are tiny next to tower activations.
3. **VJP pass** — a second ``lax.scan`` re-encodes each chunk under
   ``jax.vjp`` with the cached embedding grads as the cotangent,
   accumulating parameter gradients chunk by chunk.

The total gradient  Σ_chunks VJP(encode, ∂L/∂emb_chunk) + ∂L/∂θ_head  is
mathematically identical to the direct ``jax.grad`` — GradCache is a memory
schedule, not an approximation (tested to fp32 tolerance in
tests/test_gradcache.py). Peak activation memory drops from O(B) to
O(B/C) + O(B·D), at the cost of one extra forward (the same trade
``jax.checkpoint`` makes per block; GradCache makes it per example and
composes with remat).

The reference's trainers cap out at batch 64 on one GPU (SURVEY §2.3); on
TPU the global-batch InfoNCE (`parallel/contrastive.py`) already spreads
the batch over chips, and GradCache multiplies the per-chip batch on top.
Everything stays in ONE jitted step — both scans, the head grad, and the
optimizer update fuse into a single XLA program.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def chunk_batch(batch: Any, n_chunks: int) -> Any:
    """Reshape every leaf [B, ...] → [C, B/C, ...] for the chunk scans."""

    def reshape(a):
        b = a.shape[0]
        if b % n_chunks:
            raise ValueError(
                f"gradcache: batch size {b} not divisible by {n_chunks} chunks"
            )
        return a.reshape((n_chunks, b // n_chunks) + a.shape[1:])

    return jax.tree.map(reshape, batch)


def gradcache_value_and_grad(
    encode_fn: Callable[[Any, Any], Any],
    head_fn: Callable[[Any, Any, Any], tuple[jax.Array, dict]],
    n_chunks: int,
):
    """Build the chunked exact value-and-grad.

    ``encode_fn(params, chunk) -> embeddings`` (pytree, leaves [c, ...]) is
    the expensive part whose activations must stay chunk-bounded.
    ``head_fn(params, embeddings, aux) -> (loss, metrics)`` sees the FULL
    [B, ...] embeddings (flattened from the chunk scan) plus any unchunked
    aux (labels, rng) and may also read loss-side params.

    Returns ``fn(params, batch, aux) -> ((loss, metrics), grads)`` where
    ``batch`` leaves are [B, ...]; grads match ``jax.grad`` of the
    monolithic composition exactly.
    """

    def fn(params: Any, batch: Any, aux: Any):
        chunks = chunk_batch(batch, n_chunks)

        # pass 1: features only — scan frees per-chunk activations
        def f1(_, cb):
            return None, encode_fn(params, cb)

        _, embs = jax.lax.scan(f1, None, chunks)
        flat = jax.tree.map(lambda e: e.reshape((-1,) + e.shape[2:]), embs)

        # head: loss + grads w.r.t. embeddings AND loss-side params
        def head(emb, p):
            return head_fn(p, emb, aux)

        (loss, metrics), (g_emb, g_head) = jax.value_and_grad(
            head, argnums=(0, 1), has_aux=True
        )(flat, params)
        g_emb_chunks = jax.tree.map(lambda g, e: g.reshape(e.shape), g_emb, embs)

        # pass 2: chunk VJPs against the cached embedding cotangents
        def f2(acc, xs):
            cb, ge = xs
            _, vjp = jax.vjp(lambda p: encode_fn(p, cb), params)
            (gp,) = vjp(ge)
            return jax.tree.map(jnp.add, acc, gp), None

        zeros = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), params)
        g_enc, _ = jax.lax.scan(f2, zeros, (chunks, g_emb_chunks))
        grads = jax.tree.map(jnp.add, g_enc, g_head)
        return (loss, metrics), grads

    return fn
