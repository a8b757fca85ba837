"""TTL caches for the serving tier.

Reference counterpart: ``CacheService`` (`Backend/services/cache_service.py`)
— ad-hoc per-kind dict caches with a 3600 s TTL (UMAP: 24 h) and per-video
invalidation, unguarded under a threaded server. This version is one generic
lock-guarded TTL cache with the same capabilities.

Note most of the reference's caching exists to paper over recomputation the
TPU design already eliminates (jitted encoders, scores returned with top-k);
what remains worth caching: text features (in EmbeddingEngine), search
results, and projection (UMAP-equivalent) results.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Hashable


class TTLCache:
    def __init__(self, default_ttl: float = 3600.0, max_entries: int = 4096):
        self.default_ttl = default_ttl
        self.max_entries = max_entries
        self._data: dict[Hashable, tuple[float, Any]] = {}
        self._lock = threading.Lock()

    def get(self, key: Hashable, default: Any = None) -> Any:
        now = time.monotonic()
        with self._lock:
            entry = self._data.get(key)
            if entry is None:
                return default
            expires, value = entry
            if now >= expires:
                del self._data[key]
                return default
            return value

    def set(self, key: Hashable, value: Any, ttl: float | None = None) -> None:
        ttl = self.default_ttl if ttl is None else ttl
        with self._lock:
            if len(self._data) >= self.max_entries:
                # drop expired first, then oldest-expiring
                now = time.monotonic()
                self._data = {k: v for k, v in self._data.items() if v[0] > now}
                while len(self._data) >= self.max_entries:
                    oldest = min(self._data, key=lambda k: self._data[k][0])
                    del self._data[oldest]
            self._data[key] = (time.monotonic() + ttl, value)

    def invalidate(self, predicate=None) -> int:
        """Remove entries (all, or those whose key matches the predicate).
        Returns number removed — per-video invalidation parity
        (`cache_service.py:256-279`)."""
        with self._lock:
            if predicate is None:
                n = len(self._data)
                self._data.clear()
                return n
            doomed = [k for k in self._data if predicate(k)]
            for k in doomed:
                del self._data[k]
            return len(doomed)

    def __len__(self) -> int:
        return len(self._data)
