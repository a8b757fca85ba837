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


class ImageSearcher:
    def __init__(self, engine, index, compute_dtype=None):
        self.engine = engine
        self.index = index
        self.dtype = compute_dtype or engine.compute_dtype
        self._fn_cache: dict[int, callable] = {}

    def _fused_fn(self, k: int):
        if k in self._fn_cache:
            return self._fn_cache[k]
        cfg = self.engine.cfg
        dtype = self.dtype
        mean = jnp.asarray(CLIP_MEAN, jnp.float32)
        std = jnp.asarray(CLIP_STD, jnp.float32)

        @jax.jit
        def fused(params, index_dev, staged_u8, start, end):
            x = (staged_u8.astype(jnp.float32) / 255.0 - mean) / std
            img = encode_image(params, cfg, x, dtype=dtype)
            q = img / jnp.maximum(jnp.linalg.norm(img, axis=-1, keepdims=True), 1e-12)
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
        self, staged_u8: np.ndarray, top_k: int, video_name: str | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """staged_u8: uint8 [Q, S, S, 3] (already resized/cropped)."""
        device_index, _, start, end, _ = self.index.snapshot(video_name)
        k = max(1, min(top_k, end - start))
        fused = self._fused_fn(k)
        scores, rows = fused(
            self.engine.params,
            device_index,
            jnp.asarray(staged_u8),
            jnp.int32(start),
            jnp.int32(end),
        )
        return np.asarray(scores), np.asarray(rows)
