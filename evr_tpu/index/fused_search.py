"""Fused text→top-k search: one device dispatch per query batch.

The serving hot path is tokenize (host) → encode_text → normalise → GEMM →
top-k. Run as separate calls, each step pays a host↔device round trip —
which dominates p50 latency on dispatch-expensive links. ``TextSearcher``
closes over the model params and the device index and jits the whole chain,
so a query costs exactly one dispatch and one (k-sized) fetch.

The reference equivalent is two torch calls plus numpy math per query
(`embedding_service.py:151-344`) with a text-feature cache papering over the
cost; here the cache is still kept (hot queries skip even the one dispatch).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from evr_tpu.models.clip import encode_text


class TextSearcher:
    """One-dispatch text search over a FrameIndex."""

    def __init__(self, engine, index, compute_dtype=None):
        self.engine = engine
        self.index = index
        self.dtype = compute_dtype or engine.compute_dtype
        self._fn_cache: dict[tuple, callable] = {}
        self._result_cache: dict[tuple, tuple] = {}

    def _fused_fn(self, k: int):
        if k in self._fn_cache:
            return self._fn_cache[k]
        cfg = self.engine.cfg
        dtype = self.dtype

        @jax.jit
        def fused(params, index_dev, tokens, start, end):
            txt = encode_text(params, cfg, tokens, dtype=dtype)
            q = txt / jnp.maximum(jnp.linalg.norm(txt, axis=-1, keepdims=True), 1e-12)
            sims = jnp.dot(
                q.astype(index_dev.dtype),
                index_dev.T,
                preferred_element_type=jnp.float32,
            )
            rows = jnp.arange(index_dev.shape[0])[None, :]
            sims = jnp.where((rows >= start) & (rows < end), sims, -jnp.inf)
            return jax.lax.top_k(sims, k)

        self._fn_cache[k] = fused
        return fused

    def search(
        self, queries, top_k: int, video_name: str | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(scores [Q, k], global rows [Q, k]) in one device call."""
        if isinstance(queries, str):
            queries = [queries]
        device_index, _, start, end, version = self.index.snapshot(video_name)
        k = max(1, min(top_k, end - start))

        cache_key = (
            self.engine.active_model,
            version,
            tuple(queries),
            k,
            video_name,
        )
        if cache_key in self._result_cache:
            return self._result_cache[cache_key]

        tokens = self.engine.tokenizer(
            list(queries), context_length=self.engine.cfg.text.context_length
        )
        fused = self._fused_fn(k)
        scores, rows = fused(
            self.engine.params,
            device_index,
            jnp.asarray(tokens),
            jnp.int32(start),
            jnp.int32(end),
        )
        out = (np.asarray(scores), np.asarray(rows))
        self._result_cache[cache_key] = out
        if len(self._result_cache) > 4096:
            self._result_cache.clear()
        return out

    def invalidate(self):
        """Call after the index or active model changes."""
        self._result_cache.clear()
