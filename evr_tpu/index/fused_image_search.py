"""Fused image→top-k search: one device dispatch per image-query batch.

Mirror of ``fused_search.TextSearcher`` for the image-query path
(`search_service.py:611-706`): staged uint8 image → normalize → encode_image
→ L2 → GEMM → top-k in a single jitted call. The reference's image search
re-encodes every *candidate* frame from disk per query
(`embedding_service.py:394-423`); here candidates come from the resident
index and only the query image is ever encoded.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from evr_tpu.models.clip import encode_image
from evr_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD
from evr_tpu.ops.topk import cosine_topk


class ImageSearcher:
    """``batch_window_ms``: coalesce concurrent single-image searches into
    one dispatch (same leader/follower scheme as TextSearcher)."""

    def __init__(self, engine, index, compute_dtype=None,
                 batch_window_ms: float | None = None, max_batch: int = 8):
        self.engine = engine
        self.index = index
        self.dtype = compute_dtype or engine.compute_dtype
        self._fn_cache: dict[int, callable] = {}
        self._batcher = None
        if batch_window_ms is not None:
            from evr_tpu.serving.batcher import MicroBatcher

            self.max_batch = max_batch
            self._batcher = MicroBatcher(
                self._search_group, max_batch=max_batch,
                window_s=batch_window_ms / 1e3,
            )

    def _search_group(self, key, items: list) -> list:
        """Same flush contract as TextSearcher._search_group: params pinned
        to the submit-time model, k clamped to the flush-time snapshot,
        results padded back to the promised k."""
        from evr_tpu.serving.batcher import flush_padded

        model, _version, k, video_name = key
        params = self.engine.models[model]["clip"]
        snapshot = self.index.snapshot(video_name)
        k_now = max(1, min(k, snapshot[3] - snapshot[2]))

        def run(padded):
            s, r = self._run_fused(np.stack(padded), k_now, snapshot, params)
            if k_now < k:
                pad = ((0, 0), (0, k - k_now))
                s = np.pad(s, pad, constant_values=-np.inf)
                r = np.pad(r, pad, constant_values=0)
            return s, r

        return flush_padded(items, self.max_batch, run)

    def _fused_fn(self, k: int):
        if k in self._fn_cache:
            return self._fn_cache[k]
        cfg = self.engine.cfg
        dtype = self.dtype
        mean = jnp.asarray(CLIP_MEAN, jnp.float32)
        std = jnp.asarray(CLIP_STD, jnp.float32)

        @jax.jit
        def fused(params, index_dev, row_scales, staged_u8, start, end):
            x = (staged_u8.astype(jnp.float32) / 255.0 - mean) / std
            img = encode_image(params, cfg, x, dtype=dtype)
            # cosine_topk handles index storage dtypes (fp32/bf16/int8 with
            # post-GEMM rescaling), masking, and query normalisation.
            return cosine_topk(index_dev, img, start, end, k, row_scales)

        self._fn_cache[k] = fused
        return fused

    def search(
        self, staged_u8: np.ndarray, top_k: int, video_name: str | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """staged_u8: uint8 [Q, S, S, 3] (already resized/cropped)."""
        snapshot = self.index.snapshot(video_name)
        k = max(1, min(top_k, snapshot[3] - snapshot[2]))
        if self._batcher is not None and staged_u8.shape[0] == 1:
            row = self._batcher.submit(
                (self.engine.active_model, snapshot[4], k, video_name),
                staged_u8[0],
            )
            return row[0][None], row[1][None]
        return self._run_fused(staged_u8, k, snapshot, self.engine.params)

    def _run_fused(
        self, staged_u8: np.ndarray, k: int, snapshot, params
    ) -> tuple[np.ndarray, np.ndarray]:
        device_index, row_scales, start, end, _ = snapshot
        fused = self._fused_fn(k)
        scores, rows = fused(
            params,
            device_index,
            row_scales,
            jnp.asarray(staged_u8),
            jnp.int32(start),
            jnp.int32(end),
        )
        return np.asarray(scores), np.asarray(rows)
