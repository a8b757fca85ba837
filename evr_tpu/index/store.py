"""HBM-resident L2-normalised frame index + durable per-video registry.

Reference counterparts:

- per-video ``{name}_embeddings.npy`` files, loaded and row-normalised on
  demand with a TTL cache (`Backend/services/embedding_service.py:186-217`);
- ``metadata/video_mapping.json`` registry of per-video artefact paths
  (`Backend/services/path_service.py:23-112`);
- brute-force ``np.dot`` search per video (`embedding_service.py:284-344`).

TPU-native design: all videos live in ONE device-resident (N_padded, D)
matrix, each video owning a contiguous row interval. A search over any video
(or all of them) is a row-range-masked GEMM + top-k (`evr_tpu.ops.topk`),
optionally sharded across a mesh (`evr_tpu.parallel.sharded_search`). Row →
(video, frame_name) resolution is O(1) host-side bookkeeping, which kills the
reference's O(k·N) metadata scans (`query_strategies.py:157`).
"""

from __future__ import annotations

import json
import pathlib
import threading
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from evr_tpu.ops.topk import cosine_topk


@dataclass
class VideoEntry:
    name: str
    n_frames: int
    row_start: int = 0
    frame_names: list[str] = field(default_factory=list)


@dataclass
class SearchHit:
    video: str
    frame_name: str
    score: float
    row: int
    frame_index: int  # position within the video (== reference frames[i] order)


class FrameIndex:
    """In-memory + on-device cosine retrieval index over video frames."""

    def __init__(
        self,
        embed_dim: int = 512,
        pad_multiple: int = 1024,
        mesh=None,
        mesh_axis: str = "data",
        device_dtype: str = "float32",
        search_impl: str = "xla",
        ivf_nprobe: int = 32,
        ivf_clusters: int | None = None,
        ivfpq_host_store: bool = False,
    ):
        """``device_dtype``: 'float32' (exact — use for rank-parity eval),
        'bfloat16' (2× less HBM bandwidth), or 'int8' (4× less: symmetric
        per-row quantisation with exact post-GEMM rescaling). Scores always
        accumulate fp32; rank flips under reduced precision only occur
        between rows whose fp32 scores differ by less than the quantisation
        step (~1e-2 int8) — acceptable for serving.

        ``search_impl``: 'xla' (default — one GEMM + lax.top_k), 'pallas'
        (fused tile-streaming kernel, `ops/retrieval_pallas.py`; never
        materialises the [Q, N] score matrix in HBM — measured ~14% faster
        at multi-million-row scale, see PERF.md; falls back to XLA when the
        padded row count doesn't tile or the index is mesh-sharded), or
        'ivf' (approximate inverted-file tier, `index/ivf.py` — global
        searches probe ``ivf_nprobe`` of ``ivf_clusters`` k-means lists
        instead of reading every row; nprobe = n_clusters is bit-exact
        brute force. Video-scoped searches always run exact (a single
        video's row range is small). ``ivf_clusters=None`` → ~√N (per
        shard under a mesh). With a device mesh this tier row-shards into
        per-device sub-indexes probed by ONE shard_map dispatch
        (`parallel/sharded_ann.ShardedIVFIndex`; float32/bfloat16 shards
        — int8+ivf stays single-device), or 'ivfpq'
        (probed + PQ-compressed tier, `index/ivfpq.py` — same probing
        semantics over residual uint8 codes with an always-on exact
        re-rank of 4×k candidates; same restrictions as 'ivf'. Under a
        mesh it row-shards the same way —
        `parallel/sharded_ann.ShardedIVFPQIndex`, per-shard quantizers,
        one shard_map probe+ADC dispatch, re-rank over merged global
        candidates).

        ``ivfpq_host_store`` (ivfpq only): the production two-tier shape at
        scale — the PQ codes are the ONLY device-resident index
        (keep_originals=False) and the re-rank rows live in host DRAM as
        int8 + per-row scales (`attach_host_store`). Re-ranked scores are
        int8-dequantized (near-tie tolerant) instead of exact fp32; use for
        corpora whose fp32 originals don't fit HBM (PERF.md §100M).
        Uploads append incrementally: new rows are quantized into the host
        store in lockstep with their appended global ids (the usual 1.5×
        rebuild bound still re-trains quantizers when the corpus outgrows
        the build)."""
        self.embed_dim = embed_dim
        self.pad_multiple = pad_multiple
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.device_dtype = device_dtype
        if search_impl not in ("xla", "pallas", "ivf", "ivfpq"):
            raise ValueError(f"unknown search_impl {search_impl!r}")
        if search_impl == "ivfpq" and device_dtype == "int8":
            # PQ already compresses to S bytes/row; int8 storage of the
            # originals buys nothing there
            raise ValueError(
                "search_impl='ivfpq' supports float32/bfloat16 storage only"
            )
        if search_impl == "ivf" and mesh is not None and device_dtype == "int8":
            raise ValueError(
                "mesh-sharded IVF stores float32/bfloat16 shards; use "
                "single-device IVF for the int8 inverted-file tier"
            )
        if ivfpq_host_store and search_impl != "ivfpq":
            raise ValueError("ivfpq_host_store requires search_impl='ivfpq'")
        self.search_impl = search_impl
        self.ivf_nprobe = ivf_nprobe
        self.ivf_clusters = ivf_clusters
        self.ivfpq_host_store = ivfpq_host_store
        self._ivf = None
        self._ivf_built_rows = 0
        self._videos: dict[str, VideoEntry] = {}
        self._embeddings: dict[str, np.ndarray] = {}
        self._order: list[str] = []
        self._device_index: jax.Array | None = None
        self._row_scales = None
        self._dirty = True
        self.version = 0  # bumped on every rebuild (cache invalidation key)
        # Serving runs threaded (upload ingestion concurrent with search);
        # mutation + build + row resolution share this lock. The reference's
        # equivalent state is unguarded dicts under Flask's threaded server
        # (SURVEY.md §5.2).
        self._lock = threading.RLock()

    # -- mutation ---------------------------------------------------------
    def add_video(
        self, name: str, embeddings: np.ndarray, frame_names: list[str] | None = None
    ) -> None:
        emb = np.asarray(embeddings, dtype=np.float32)
        if emb.ndim != 2 or emb.shape[1] != self.embed_dim:
            raise ValueError(
                f"embeddings for {name!r} must be (N, {self.embed_dim}), got {emb.shape}"
            )
        if frame_names is None:
            frame_names = [f"{i}.jpg" for i in range(len(emb))]
        if len(frame_names) != len(emb):
            raise ValueError(
                f"{name!r}: {len(frame_names)} frame names for {len(emb)} embeddings"
            )
        with self._lock:
            if self._try_append(name, emb, frame_names):
                return
            if name not in self._videos:
                self._order.append(name)
            self._videos[name] = VideoEntry(name, len(emb), 0, list(frame_names))
            self._embeddings[name] = emb
            self._dirty = True

    def _try_append(self, name: str, emb: np.ndarray, frame_names: list[str]) -> bool:
        """Incremental device-side append: a NEW video whose rows fit the
        already-allocated padding is written in place with
        dynamic_update_slice — no O(total) rebuild per upload. Falls back to
        a rebuild (returns False) for replacements, sharded/quantised
        indexes, or when capacity is exhausted."""
        if (
            self._dirty
            or self._device_index is None
            or name in self._videos
            or self.mesh is not None
            or self._row_scales is not None
            # IVF/IVF-PQ support incremental appends (below) once their
            # lists exist
            or (self.search_impl in ("ivf", "ivfpq") and self._ivf is None)
        ):
            return False
        n = len(emb)
        capacity = self._device_index.shape[0]
        if self._total + n > capacity:
            return False
        if self.search_impl in ("ivf", "ivfpq") and (
            # centroids/codebooks don't move on append — once the corpus
            # outgrows the build-time training by 50%, force a rebuild so
            # the lists re-balance with fresh k-means
            self._total + n > 1.5 * self._ivf_built_rows
        ):
            return False
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        rows = (emb / np.maximum(norms, 1e-12)).astype(np.float32)
        if self.search_impl in ("ivf", "ivfpq"):
            if self.ivfpq_host_store:
                # keep the host-DRAM re-rank rows in lockstep with the
                # appended global ids (search gathers the store by row id)
                scales = np.maximum(
                    np.abs(rows).max(axis=1) / 127.0, 1e-12
                ).astype(np.float32)
                quant = np.clip(
                    np.round(rows / scales[:, None]), -127, 127
                ).astype(np.int8)
                self._ivf._originals_int8 = np.concatenate(
                    [self._ivf._originals_int8, quant], axis=0
                )
                self._ivf._originals_int8_scales = np.concatenate(
                    [self._ivf._originals_int8_scales, scales], axis=0
                )
            self._ivf.append(rows)
        rows_dev = jnp.asarray(rows).astype(self._device_index.dtype)
        self._device_index = jax.lax.dynamic_update_slice(
            self._device_index, rows_dev, (self._total, 0)
        )
        self._order.append(name)
        self._videos[name] = VideoEntry(name, n, self._total, list(frame_names))
        self._embeddings[name] = emb
        self._total += n
        self.version += 1
        return True

    def remove_video(self, name: str) -> None:
        with self._lock:
            self._videos.pop(name, None)
            self._embeddings.pop(name, None)
            if name in self._order:
                self._order.remove(name)
            self._dirty = True

    # -- properties -------------------------------------------------------
    @property
    def videos(self) -> list[str]:
        return list(self._order)

    @property
    def total_frames(self) -> int:
        return sum(v.n_frames for v in self._videos.values())

    def video_entry(self, name: str) -> VideoEntry:
        return self._videos[name]

    def frame_names(self, name: str) -> list[str]:
        return list(self._videos[name].frame_names)

    def get_embeddings(self, name: str, normalised: bool = True) -> np.ndarray:
        """Per-video embedding matrix (row-normalised by default, matching
        `embedding_service.py:205-213`)."""
        emb = self._embeddings[name]
        if not normalised:
            return emb
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        return emb / np.maximum(norms, 1e-12)

    def embedding_for_frame(self, video: str, frame_name: str) -> np.ndarray:
        """Single normalised row — free lookup replacing the reference's
        re-encode path (`embedding_service.py:394-423`)."""
        entry = self._videos[video]
        i = entry.frame_names.index(frame_name)
        return self.get_embeddings(video)[i]

    # -- device build -----------------------------------------------------
    def _padded_rows(self, n: int) -> int:
        m = self.pad_multiple
        if self.mesh is not None:
            m = max(m, self.mesh.shape[self.mesh_axis] * 128)
            shards = self.mesh.shape[self.mesh_axis]
            # padded total must be divisible by shard count
            per = -(-max(n, 1) // shards)
            per = ((per + 127) // 128) * 128
            return per * shards
        # single-device: 25% headroom so uploads append in place
        n = int(n * 1.25)
        return max(m, ((n + m - 1) // m) * m)

    def build(self) -> None:
        """(Re)concatenate, normalise, pad and transfer the index to device."""
        with self._lock:
            self._build_locked()

    def _build_locked(self) -> None:
        row = 0
        mats = []
        for name in self._order:
            entry = self._videos[name]
            entry.row_start = row
            row += entry.n_frames
            mats.append(self.get_embeddings(name))
        total = row
        padded = self._padded_rows(total)
        full = np.zeros((padded, self.embed_dim), dtype=np.float32)
        if mats:
            full[:total] = np.concatenate(mats, axis=0)
        self._ivf = None
        n_shards_mesh = (
            self.mesh.shape[self.mesh_axis] if self.mesh is not None else 0
        )
        if (
            self.search_impl == "ivf"
            and self.mesh is not None
            and total >= 2 * n_shards_mesh
        ):
            # mesh-sharded ANN tier: per-shard sub-indexes + one shard_map
            # probe with an all-gather top-k merge (parallel/sharded_ann.py)
            from evr_tpu.parallel.sharded_ann import ShardedIVFIndex

            # balanced contiguous partition: smallest shard = floor(N/S)
            smallest = max(1, total // n_shards_mesh)
            k = self.ivf_clusters or max(
                1, int(round((total / n_shards_mesh) ** 0.5))
            )
            self._ivf = ShardedIVFIndex(self.mesh, self.mesh_axis).build(
                full[:total],
                n_clusters=max(1, min(k, smallest)),
                capacity_factor=1.3,
                iters=6,
                dtype=(
                    "bfloat16"
                    if self.device_dtype == "bfloat16"
                    else "float32"
                ),
            )
            self._ivf_built_rows = total
        elif self.search_impl == "ivf" and total > 1:
            from evr_tpu.index.ivf import IVFIndex

            k = self.ivf_clusters or max(1, int(round(total**0.5)))
            if self.device_dtype == "int8":
                # int8 inverted-file tier (4× less HBM; exact per-row
                # dequant at score time — index/ivf.py build_device)
                self._ivf = IVFIndex().build_device(
                    jnp.asarray(full[:total]),
                    n_clusters=min(k, total),
                    capacity_factor=1.3,
                    iters=6,
                    dtype="int8",
                )
            else:
                self._ivf = IVFIndex().build(
                    full[:total],
                    n_clusters=min(k, total),
                    capacity_factor=1.3,
                    iters=6,
                    dtype=(
                        "bfloat16"
                        if self.device_dtype == "bfloat16"
                        else "float32"
                    ),
                )
            self._ivf_built_rows = total
        elif (
            self.search_impl == "ivfpq"
            and self.mesh is not None
            and total >= 2 * n_shards_mesh
        ):
            # mesh-sharded memory tier: per-shard IVF-PQ sub-indexes + one
            # shard_map probe+ADC with an all-gather top-k merge; the
            # serving path's always-on exact re-rank (below) sources the
            # fp32 originals kept at build (parallel/sharded_ann.py)
            from evr_tpu.parallel.sharded_ann import ShardedIVFPQIndex

            # balanced contiguous partition: smallest shard = floor(N/S)
            smallest = max(1, total // n_shards_mesh)
            k = self.ivf_clusters or max(
                1, int(round((total / n_shards_mesh) ** 0.5))
            )
            sub = next(
                s for s in (64, 32, 16, 8, 4, 2, 1) if self.embed_dim % s == 0
            )
            self._ivf = ShardedIVFPQIndex(self.mesh, self.mesh_axis).build(
                full[:total],
                n_clusters=max(1, min(k, smallest)),
                n_subspaces=sub,
                n_centroids=min(256, smallest),
                capacity_factor=1.3,
                coarse_iters=6,
                pq_iters=6,
                keep_originals=not self.ivfpq_host_store,
            )
            if self.ivfpq_host_store:
                self._attach_ivfpq_host_store(full[:total])
            self._ivf_built_rows = total
        elif self.search_impl == "ivfpq" and total > 1:
            from evr_tpu.index.ivfpq import IVFPQIndex

            k = self.ivf_clusters or max(1, int(round(total**0.5)))
            # subspaces: largest divisor of D that is <= 64 (uint8 budget
            # D/sub bytes per row); originals retained for the exact
            # re-rank pass the serving path always applies
            sub = next(
                s for s in (64, 32, 16, 8, 4, 2, 1) if self.embed_dim % s == 0
            )
            self._ivf = IVFPQIndex().build(
                full[:total],
                n_clusters=min(k, total),
                n_subspaces=sub,
                n_centroids=min(256, total),
                capacity_factor=1.3,
                coarse_iters=6,
                pq_iters=6,
                keep_originals=not self.ivfpq_host_store,
            )
            if self.ivfpq_host_store:
                self._attach_ivfpq_host_store(full[:total])
            self._ivf_built_rows = total
        self._row_scales = None
        if self.device_dtype == "bfloat16":
            full = jnp.asarray(full).astype(jnp.bfloat16)
        elif self.device_dtype == "int8":
            max_abs = np.maximum(np.abs(full).max(axis=1), 1e-12)
            scales = (max_abs / 127.0).astype(np.float32)
            quant = np.clip(np.round(full / scales[:, None]), -127, 127).astype(np.int8)
            full = jnp.asarray(quant)
            self._row_scales = jnp.asarray(scales)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self.mesh, P(self.mesh_axis, None))
            self._device_index = jax.device_put(full, sharding)
        else:
            self._device_index = jnp.asarray(full)
        self._total = total
        self._dirty = False
        self.version += 1

    def _attach_ivfpq_host_store(self, rows: np.ndarray) -> None:
        """Two-tier serving shape: symmetric per-row int8 quantisation of
        the (normalised) corpus into HOST DRAM as the re-rank source — the
        device keeps only the PQ codes (32× under fp32 at S=64+scale)."""
        rows = np.asarray(rows, np.float32)
        scales = np.maximum(
            np.abs(rows).max(axis=1) / 127.0, 1e-12
        ).astype(np.float32)
        quant = np.clip(
            np.round(rows / scales[:, None]), -127, 127
        ).astype(np.int8)
        self._ivf.attach_host_store(quant, scales)

    def _ensure_built(self):
        with self._lock:
            if self._dirty or self._device_index is None:
                self._build_locked()

    # -- search -----------------------------------------------------------
    def _range_for(self, video_name: str | None) -> tuple[int, int]:
        if video_name is None:
            return 0, self._total
        entry = self._videos[video_name]
        return entry.row_start, entry.row_start + entry.n_frames

    def search_raw(
        self, queries: np.ndarray, top_k: int, video_name: str | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(scores [Q, k], global row indices [Q, k]); k clamped to range."""
        with self._lock:
            return self._search_raw_locked(queries, top_k, video_name)

    def _search_raw_locked(self, queries, top_k, video_name):
        self._ensure_built()
        start, end = self._range_for(video_name)
        k = max(1, min(top_k, end - start))
        # IVF tier: global (unscoped) searches probe inverted lists instead
        # of reading every row; scoped searches fall through to the exact
        # path (one video's range is small enough that exact is cheaper
        # than probing). Results padded to the promised k with -inf/-1 when
        # the reachable candidate set is smaller.
        if (
            self.search_impl in ("ivf", "ivfpq")
            and video_name is None
            and self._ivf is not None
        ):
            q_np = np.atleast_2d(np.asarray(queries, np.float32))
            if self.search_impl == "ivfpq":
                # codes are lossy -> always exact-re-rank 4x the ask
                scores, rows = self._ivf.search(
                    q_np, k, nprobe=self.ivf_nprobe, rerank=max(50, 4 * k)
                )
            else:
                scores, rows = self._ivf.search(q_np, k, nprobe=self.ivf_nprobe)
            if scores.shape[1] < k:
                pad = ((0, 0), (0, k - scores.shape[1]))
                scores = np.pad(scores, pad, constant_values=-np.inf)
                rows = np.pad(rows, pad, constant_values=-1)
            return scores, rows
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))

        use_sharded = (
            self.mesh is not None
            and self.mesh.shape[self.mesh_axis] > 1
            and k <= self._device_index.shape[0] // self.mesh.shape[self.mesh_axis]
        )
        if use_sharded:
            from evr_tpu.parallel.sharded_search import sharded_cosine_topk

            scores, rows = sharded_cosine_topk(
                self.mesh,
                self._device_index,
                q,
                jnp.int32(start),
                jnp.int32(end),
                k,
                self.mesh_axis,
                row_scales=self._row_scales,
            )
        else:
            impl = self.search_impl
            tile_n = 0
            if impl == "pallas":
                n_padded = self._device_index.shape[0]
                for cand in (8192, 4096, 2048, 1024):
                    if n_padded % cand == 0:
                        tile_n = cand
                        break
                if tile_n == 0:
                    impl = "xla"  # padded rows don't tile — exact fallback
            if impl == "pallas":
                from evr_tpu.ops.retrieval_pallas import fused_topk

                scores, rows = fused_topk(
                    self._device_index,
                    q,
                    jnp.int32(start),
                    jnp.int32(end),
                    k,
                    row_scales=self._row_scales,
                    tile_n=tile_n,
                )
            else:
                scores, rows = cosine_topk(
                    self._device_index,
                    q,
                    jnp.int32(start),
                    jnp.int32(end),
                    k,
                    row_scales=self._row_scales,
                )
        return np.asarray(scores), np.asarray(rows)

    def snapshot(self, video_name: str | None = None):
        """Consistent view for external searchers: (device_index, row_scales,
        start, end, version) taken under the lock — safe against concurrent
        rebuilds."""
        with self._lock:
            self._ensure_built()
            start, end = self._range_for(video_name)
            return self._device_index, self._row_scales, start, end, self.version

    def resolve_row(self, row: int) -> tuple[str, str, int]:
        """global row → (video, frame_name, frame_index)."""
        with self._lock:
            return self._resolve_row_locked(row)

    def _resolve_row_locked(self, row: int) -> tuple[str, str, int]:
        for name in self._order:
            entry = self._videos[name]
            if entry.row_start <= row < entry.row_start + entry.n_frames:
                i = row - entry.row_start
                return name, entry.frame_names[i], i
        raise IndexError(f"row {row} out of range")

    def search(
        self, queries: np.ndarray, top_k: int, video_name: str | None = None
    ) -> list[list[SearchHit]]:
        # One lock acquisition around score computation AND row resolution:
        # a remove_video between the two would compact the row layout, so a
        # just-computed row id could raise (or silently name the wrong frame).
        with self._lock:
            scores, rows = self._search_raw_locked(queries, top_k, video_name)
            out: list[list[SearchHit]] = []
            for qi in range(scores.shape[0]):
                hits = []
                for score, row in zip(scores[qi], rows[qi]):
                    if not np.isfinite(score):
                        continue
                    video, frame, fidx = self._resolve_row_locked(int(row))
                    hits.append(SearchHit(video, frame, float(score), int(row), fidx))
                out.append(hits)
            return out

    # -- persistence ------------------------------------------------------
    def save(self, data_root) -> None:
        """Persist per-video .npy + frame-name JSON, same durable layout the
        reference serving tier uses (npy matrix + metadata alignment)."""
        from evr_tpu.config import DataRootConfig

        cfg = data_root if isinstance(data_root, DataRootConfig) else DataRootConfig(pathlib.Path(data_root))
        cfg.ensure()
        for name in self._order:
            np.save(cfg.embedding_dir / f"{name}_embeddings.npy", self._embeddings[name])
            (cfg.metadata_dir / f"{name}_frames.json").write_text(
                json.dumps(self._videos[name].frame_names)
            )

    @classmethod
    def load(cls, data_root, embed_dim: int = 512, mesh=None) -> "FrameIndex":
        from evr_tpu.config import DataRootConfig

        cfg = data_root if isinstance(data_root, DataRootConfig) else DataRootConfig(pathlib.Path(data_root))
        idx = cls(embed_dim=embed_dim, mesh=mesh)
        for npy in sorted(cfg.embedding_dir.glob("*_embeddings.npy")):
            name = npy.name[: -len("_embeddings.npy")]
            emb = np.load(npy)
            frames_file = cfg.metadata_dir / f"{name}_frames.json"
            frame_names = (
                json.loads(frames_file.read_text()) if frames_file.exists() else None
            )
            idx.add_video(name, emb, frame_names)
        return idx


class VideoRegistry:
    """Durable per-video artefact registry (video_mapping.json parity).

    Schema per entry matches `path_service.py:95-112`:
    ``{metadata_file, embeddings_file, video_path, frames_dir,
    embedding_model}``. Paths are stored as given; data-root-relative paths
    are supported throughout (prune/boot resolve against the root), unlike
    the reference's absolute Windows paths that keep its own fixtures from
    loading (SURVEY.md §4).
    """

    FIELDS = (
        "metadata_file",
        "embeddings_file",
        "video_path",
        "frames_dir",
        "embedding_model",  # which model produced the embeddings (app.py:655)
        "transcript_file",  # optional ASR transcript (ingest/transcripts.py)
    )

    def __init__(self, mapping_path):
        self.path = pathlib.Path(mapping_path)
        self._mapping: dict[str, dict] = {}
        if self.path.exists():
            self._mapping = json.loads(self.path.read_text())

    def add(self, name: str, **paths) -> None:
        unknown = set(paths) - set(self.FIELDS)
        if unknown:
            raise KeyError(f"unknown registry fields: {sorted(unknown)}")
        self._mapping[name] = {k: str(v) for k, v in paths.items()}
        self.save()

    def remove(self, name: str) -> None:
        if self._mapping.pop(name, None) is not None:
            self.save()

    def get(self, name: str) -> dict | None:
        return self._mapping.get(name)

    def names(self) -> list[str]:
        return list(self._mapping)

    def save(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(self._mapping, indent=2, ensure_ascii=False))

    def prune_missing(self, root: pathlib.Path | None = None) -> list[str]:
        """Drop entries whose video file disappeared — the self-heal the
        reference performs at boot (`app.py:230-268`)."""
        dropped = []
        for name, entry in list(self._mapping.items()):
            vp = pathlib.Path(entry.get("video_path", ""))
            if root is not None and not vp.is_absolute():
                vp = root / vp
            if not vp.exists():
                dropped.append(name)
                del self._mapping[name]
        if dropped:
            self.save()
        return dropped
