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
from evr_tpu.ops.topk import cosine_topk


class TextSearcher:
    """One-dispatch text search over a FrameIndex.

    ``batch_window_ms``: enable dynamic micro-batching — concurrent
    single-query searches arriving within the window coalesce into ONE
    device dispatch (serving/batcher.py). Off by default; zero-cost for
    sequential callers beyond the window wait.
    """

    def __init__(self, engine, index, compute_dtype=None,
                 batch_window_ms: float | None = None, max_batch: int = 16):
        self.engine = engine
        self.index = index
        self.dtype = compute_dtype or engine.compute_dtype
        self._fn_cache: dict[tuple, callable] = {}
        self._result_cache: dict[tuple, tuple] = {}
        self._batcher = None
        if batch_window_ms is not None:
            from evr_tpu.serving.batcher import MicroBatcher

            self.max_batch = max_batch
            self._batcher = MicroBatcher(
                self._search_group, max_batch=max_batch,
                window_s=batch_window_ms / 1e3,
            )

    def _fused_fn(self, k: int):
        if k in self._fn_cache:
            return self._fn_cache[k]
        cfg = self.engine.cfg
        dtype = self.dtype

        @jax.jit
        def fused(params, index_dev, row_scales, tokens, start, end):
            txt = encode_text(params, cfg, tokens, dtype=dtype)
            # cosine_topk handles index storage dtypes (fp32/bf16/int8 with
            # post-GEMM rescaling) and row-range masking; it normalises the
            # query itself.
            return cosine_topk(index_dev, txt, start, end, k, row_scales)

        self._fn_cache[k] = fused
        return fused

    def _dispatch(
        self, queries: list, k: int, device_index, row_scales, start: int, end: int,
        params=None,
    ) -> tuple[np.ndarray, np.ndarray]:
        tokens = self.engine.tokenizer(
            list(queries), context_length=self.engine.cfg.text.context_length
        )
        fused = self._fused_fn(k)
        scores, rows = fused(
            self.engine.params if params is None else params,
            device_index,
            row_scales,
            jnp.asarray(tokens),
            jnp.int32(start),
            jnp.int32(end),
        )
        return np.asarray(scores), np.asarray(rows)

    def _search_group(self, key, items: list) -> list:
        """MicroBatcher flush: run every coalesced query of a compatible
        group as ONE device dispatch. The group key records the SUBMIT-time
        (model, version, k, scope); the flush pins the params to that model
        (a concurrent set_active_model must not contaminate the group) and
        clamps k to the flush-time snapshot, padding results to the promised
        k with -inf scores if the index shrank inside the window."""
        from evr_tpu.serving.batcher import flush_padded

        model, _version, k, video_name = key
        params = self.engine.models[model]["clip"]
        device_index, row_scales, start, end, flush_version = self.index.snapshot(
            video_name
        )
        k_now = max(1, min(k, end - start))

        def run(padded):
            s, r = self._dispatch(
                padded, k_now, device_index, row_scales, start, end, params=params
            )
            if k_now < k:  # index shrank mid-window: keep the promised shape
                pad = ((0, 0), (0, k - k_now))
                s = np.pad(s, pad, constant_values=-np.inf)
                r = np.pad(r, pad, constant_values=0)
            return s, r

        results = flush_padded(items, self.max_batch, run)
        # Cache under the FLUSH-time version (the snapshot the results
        # actually reflect), never the submit-time version in ``key`` — if
        # the index advanced inside the batching window, the two differ and
        # a submit-version cache entry would serve stale rows.
        for query, (s_row, r_row) in zip(items, results):
            self._result_cache[(model, flush_version, (query,), k, video_name)] = (
                s_row[None], r_row[None],
            )
        if len(self._result_cache) > 4096:
            self._result_cache.clear()
        return results

    def search(
        self, queries, top_k: int, video_name: str | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(scores [Q, k], global rows [Q, k]) in one device call."""
        if isinstance(queries, str):
            queries = [queries]
        device_index, row_scales, start, end, version = self.index.snapshot(video_name)
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

        if self._batcher is not None and len(queries) == 1:
            row = self._batcher.submit(
                (self.engine.active_model, version, k, video_name), queries[0]
            )
            # caching happens inside _search_group under the FLUSH-time
            # version — the snapshot the results actually reflect
            return (row[0][None], row[1][None])
        out = self._dispatch(queries, k, device_index, row_scales, start, end)
        self._result_cache[cache_key] = out
        if len(self._result_cache) > 4096:
            self._result_cache.clear()
        return out

    def invalidate(self):
        """Call after the index or active model changes."""
        self._result_cache.clear()
