"""ServingContext — the wired service graph behind the HTTP API.

Reference counterpart: ``initialize_services`` (`Backend/services/__init__.
py:11-64`) plus the module-level globals in `app.py`. One object owns the
data root, the embedding engine, the device index, the metadata store, the
registry and the caches; ``boot()`` restores all durable state from disk
(the .npy/JSON index layout + video_mapping.json is the serving tier's
checkpoint format, SURVEY.md §5.4).
"""

from __future__ import annotations

import base64
import io
import pathlib
import time

import numpy as np

from evr_tpu.config import DataRootConfig
from evr_tpu.index import EmbeddingEngine, FrameIndex, VideoRegistry
from evr_tpu.ingest.pipeline import ingest_video, video_fps
from evr_tpu.query import MetadataStore, QueryEngine
from .cache import TTLCache


class ServingContext:
    def __init__(
        self,
        data_root: DataRootConfig | str = "data",
        engine: EmbeddingEngine | None = None,
        mesh=None,
        transcriber=None,
        scene_threshold: float = 30.0,
        index_dtype: str = "float32",
        search_impl: str = "xla",
        ivf_nprobe: int = 32,
        ivf_clusters: int | None = None,
        ivfpq_host_store: bool = False,
        batch_window_ms: float | None = None,
        preprocessor=None,
        annotator=None,
    ):
        self.data_root = (
            data_root
            if isinstance(data_root, DataRootConfig)
            else DataRootConfig(pathlib.Path(data_root))
        )
        self.engine = engine or EmbeddingEngine()
        self.mesh = mesh
        # One index PER embedding model: text queries with model M only ever
        # score embeddings M produced. The reference searches whatever .npy
        # exists regardless of the active model — a silent ranking corruption
        # this design makes impossible.
        self._indexes: dict[str, FrameIndex] = {}
        self._query_engines: dict[str, QueryEngine] = {}
        self.metadata = MetadataStore()
        self.registry = VideoRegistry(self.data_root.mapping_path)
        self.search_cache = TTLCache(default_ttl=3600.0)
        self.viz_cache = TTLCache(default_ttl=24 * 3600.0)
        self.transcriber = transcriber
        # Query preprocessing: local-first Vietnamese pipeline with the
        # zero-egress dictionary translator by default (the reference calls
        # GoogleTranslator on the hot path, word_processing.py:22-27; a
        # network provider can be injected here instead).
        if preprocessor is None:
            from evr_tpu.query import VietnamesePreprocessor
            from evr_tpu.query.translate import DictionaryTranslator

            preprocessor = VietnamesePreprocessor(translator=DictionaryTranslator())
        self.preprocessor = preprocessor
        # default frame annotator for uploads (None → empty detections);
        # e.g. ingest.zeroshot.ZeroShotObjectAnnotator fills object
        # detections with the serving CLIP towers, no YOLO needed
        self.annotator = annotator
        self.scene_threshold = scene_threshold
        # index storage dtype (fp32/bf16/int8) + scoring impl (xla/pallas) —
        # see FrameIndex; applied to every per-model index
        self.index_dtype = index_dtype
        self.search_impl = search_impl
        self.ivf_nprobe = ivf_nprobe
        self.ivf_clusters = ivf_clusters
        self.ivfpq_host_store = ivfpq_host_store
        # Fail fast on invalid tier combos (ivf/ivfpq × int8 or a mesh):
        # per-model indexes build lazily, so with an empty registry an
        # invalid combo would boot "cleanly" and then 500 every request.
        FrameIndex(
            embed_dim=1,
            mesh=mesh,
            device_dtype=index_dtype,
            search_impl=search_impl,
            ivfpq_host_store=ivfpq_host_store,
        )
        # coalesce concurrent semantic queries into one device dispatch
        # (serving/batcher.py); None disables
        self.batch_window_ms = batch_window_ms

    def resolve_path(self, p: str) -> pathlib.Path:
        """Registry paths may be data-root-relative (relocatable) or
        absolute; resolve accordingly."""
        path = pathlib.Path(p)
        return path if path.is_absolute() else self.data_root.root / path

    def first_frame(self, frames_dir) -> str | None:
        """First extracted frame of a video in NUMERIC {frameidx}.jpg order
        (lexicographic order puts 40.jpg before 5.jpg); None when the dir is
        missing or empty. Shared by the /api/videos listing and the
        upload-response thumbnail."""
        if not frames_dir:
            return None
        d = self.resolve_path(frames_dir)
        if not d.exists():
            return None

        def order(p):
            try:
                return (0, int(p.stem), p.name)
            except ValueError:
                return (1, 0, p.name)

        frames = sorted((p for p in d.iterdir() if p.is_file()), key=order)
        return str(frames[0]) if frames else None

    def _stage(self, rgb: np.ndarray) -> np.ndarray:
        """Stage a query image with the ENGINE's preprocessing geometry:
        engines may own their stager (SigLIP squash-resizes, no crop);
        CLIP engines use the standard shorter-side-resize + center-crop."""
        stage = getattr(self.engine, "stage_array", None)
        if stage is not None:
            return stage(rgb)
        from evr_tpu.index.engine import stage_array_fast

        return stage_array_fast(rgb, self.engine.cfg.vision.image_size)

    # -- per-model index routing ------------------------------------------
    def index_for(self, model: str) -> FrameIndex:
        if model not in self._indexes:
            self._indexes[model] = FrameIndex(
                embed_dim=self.engine.cfg.embed_dim,
                mesh=self.mesh,
                device_dtype=self.index_dtype,
                search_impl=self.search_impl,
                ivf_nprobe=self.ivf_nprobe,
                ivf_clusters=self.ivf_clusters,
                ivfpq_host_store=self.ivfpq_host_store,
            )
        return self._indexes[model]

    @property
    def index(self) -> FrameIndex:
        """The active model's index."""
        return self.index_for(self.engine.active_model)

    @property
    def query_engine(self) -> QueryEngine:
        model = self.engine.active_model
        if model not in self._query_engines:
            self._query_engines[model] = QueryEngine(
                self.engine, self.index_for(model), self.metadata,
                batch_window_ms=self.batch_window_ms,
                preprocessor=self.preprocessor,
            )
        return self._query_engines[model]

    # -- boot / durable state ---------------------------------------------
    def boot(self) -> list[str]:
        """Load every registered video's embeddings + metadata from disk;
        prune registry entries whose video file disappeared (`app.py:230-268`
        self-heal). Returns the video names loaded."""
        import json

        self.registry.prune_missing(self.data_root.root)

        resolve = self.resolve_path
        loaded = []
        for name in self.registry.names():
            entry = self.registry.get(name)
            emb_path = resolve(entry.get("embeddings_file", ""))
            meta_path = resolve(entry.get("metadata_file", ""))
            if not emb_path.exists():
                continue
            emb = np.load(emb_path)
            records = (
                json.loads(meta_path.read_text(encoding="utf-8"))
                if meta_path.exists()
                else []
            )
            frame_names = [r.get("frameid", f"{i}.jpg") for i, r in enumerate(records)]
            if len(frame_names) != len(emb):
                frame_names = None
            model = entry.get("embedding_model", "original")
            self.index_for(model).add_video(name, emb, frame_names)
            fps = 25.0
            video_path = entry.get("video_path", "")
            if video_path and resolve(video_path).exists():
                fps = video_fps(resolve(video_path))
            self.metadata.add_video(name, records, fps=fps)
            # ASR transcript (speech search): registry field first, then the
            # `{video}_transcript.json` sidecar convention
            tr_path = resolve(entry.get("transcript_file", ""))
            if not (entry.get("transcript_file") and tr_path.exists()):
                from evr_tpu.ingest.transcripts import transcript_path_for

                tr_path = transcript_path_for(meta_path, name)
            if tr_path.exists():
                try:
                    self.metadata.load_transcript_json(name, tr_path)
                except (ValueError, KeyError) as e:
                    from evr_tpu.utils import get_logger

                    get_logger("evr_tpu.serving").warning(
                        "skipping unreadable transcript %s: %s", tr_path, e
                    )
            loaded.append(name)
        return loaded

    def prune_missing(self) -> list[str]:
        """Self-heal: drop registry entries whose video file disappeared,
        and purge EVERY store that caches per-video state — embedding
        indexes, frame metadata, transcripts (`app.py:230-268`). Pruning
        only the registry leaves keyword/object/speech searches returning
        events whose videoIds no longer resolve."""
        dropped = self.registry.prune_missing(self.data_root.root)
        for name in dropped:
            for index in self._indexes.values():
                index.remove_video(name)
            self.metadata.remove_video(name)
        return dropped

    # -- video identity ---------------------------------------------------
    def video_names(self) -> list[str]:
        return self.registry.names()

    def video_name_from_id(self, video_id: str) -> str | None:
        """'video-N' (1-based registry order) → video name (`app.py:415-420`)."""
        if not video_id or not video_id.startswith("video-"):
            return None
        try:
            num = int(video_id.split("-")[1])
        except (IndexError, ValueError):
            return None
        names = self.video_names()
        if 1 <= num <= len(names):
            return names[num - 1]
        return None

    # -- video file info --------------------------------------------------
    @staticmethod
    def video_file_info(video_path: str) -> dict:
        import cv2

        info = {"duration": 0.0, "resolution": "unknown"}
        cap = cv2.VideoCapture(video_path)
        try:
            if cap.isOpened():
                fps = cap.get(cv2.CAP_PROP_FPS) or 0
                frames = cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0
                if fps > 0:
                    info["duration"] = frames / fps
                w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
                h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
                if w and h:
                    info["resolution"] = f"{w}x{h}"
        finally:
            cap.release()
        return info

    def video_summary(self, idx: int, name: str) -> dict | None:
        entry = self.registry.get(name) or {}
        video_path = entry.get("video_path", "")
        p = self.resolve_path(video_path) if video_path else None
        if p is None or not p.exists():
            return None
        thumbnail = self.first_frame(entry.get("frames_dir"))
        info = self.video_file_info(str(p))
        return {
            "id": f"video-{idx}",
            "title": name,
            "thumbnail": thumbnail,
            "duration": info["duration"],
            "uploadDate": time.strftime("%Y-%m-%d", time.gmtime(p.stat().st_ctime)),
            "size": f"{p.stat().st_size // (1024 * 1024)} MB",
            "resolution": info["resolution"],
            "path": str(video_path),
        }

    # -- ingestion --------------------------------------------------------
    def ingest(self, video_path, video_name=None, annotator=None, progress=None):
        result = ingest_video(
            video_path,
            self.data_root,
            self.engine,
            index=self.index,
            registry=self.registry,
            metadata_store=self.metadata,
            annotator=annotator if annotator is not None else self.annotator,
            scene_threshold=self.scene_threshold,
            video_name=video_name,
            progress=progress,
        )
        self.search_cache.invalidate()
        self.viz_cache.invalidate()
        return result

    @property
    def ingest_jobs(self):
        """Lazy background ingest-job manager (serving/jobs.py)."""
        if not hasattr(self, "_ingest_jobs"):
            from .jobs import IngestJobManager

            self._ingest_jobs = IngestJobManager()
        return self._ingest_jobs

    def upload_payload(self, save_path, video_name, model_name, result) -> dict:
        """The legacy synchronous upload response body — now also the
        terminal payload of an async ingest job (frontend contract:
        VideoContext.tsx:196-216 reads status=='success' && video{...})."""
        info = self.video_file_info(str(save_path))
        return {
            "status": "success",
            "message": "Video processed successfully",
            "video": {
                "id": f"video-{int(time.time())}",
                "title": video_name,
                "thumbnail": self.first_frame(result.frames_dir),
                "path": str(save_path),
                "uploadDate": time.strftime("%Y-%m-%d"),
                "size": f"{save_path.stat().st_size // (1024 * 1024)} MB",
                "resolution": info["resolution"],
                "duration": info["duration"],
                "embedding_model": model_name,
                "frames": result.n_frames,
            },
        }

    # -- image search (`search_service.py:611-706`) -----------------------
    def load_image_source(self, source: str):
        """Resolve an image search source: data-URL / base64 / local path.
        (The reference also fetches http URLs — a deliberate scope cut in
        zero-egress deployments; callers get a clear error.)"""
        from PIL import Image

        if source.startswith("data:"):
            payload = source.split(",", 1)[1]
            return Image.open(io.BytesIO(base64.b64decode(payload))).convert("RGB")
        if source.startswith(("http://", "https://")):
            raise ValueError(
                "remote image URLs are not fetched in this deployment; "
                "send base64 or a local path"
            )
        path = pathlib.Path(source)
        if path.exists():
            return Image.open(path).convert("RGB")
        try:
            return Image.open(io.BytesIO(base64.b64decode(source))).convert("RGB")
        except Exception:
            raise ValueError(f"cannot resolve image source: {source[:64]}")

    def search_by_image(
        self, source: str, threshold: float, top_k: int, video_name: str | None = None
    ) -> list[dict]:
        img = self.load_image_source(source)
        staged = self._stage(np.ascontiguousarray(np.asarray(img)))

        if not hasattr(self.engine, "models"):
            # non-CLIP engines (e.g. SiglipEngine): the fused ImageSearcher
            # bakes CLIP's mean/std + encode_image, so take the two-step
            # path through the engine's own preprocessing instead
            v = np.asarray(
                self.engine.encode_staged_images(staged[None], normalise=True)
            )[0]
            scores, rows = self.index.search_raw(v[None], top_k * 3, video_name)
            return self._events_from_rows(scores[0], rows[0], threshold, top_k)

        # fused one-dispatch path: normalize → encode_image → GEMM → top-k
        from evr_tpu.index.fused_image_search import ImageSearcher

        if not hasattr(self, "_image_searchers"):
            self._image_searchers = {}
        model = self.engine.active_model
        if model not in self._image_searchers:
            self._image_searchers[model] = ImageSearcher(
                self.engine, self.index, batch_window_ms=self.batch_window_ms
            )
        scores, rows = self._image_searchers[model].search(
            staged[None], top_k * 3, video_name
        )

        return self._events_from_rows(scores[0], rows[0], threshold, top_k)

    def _events_from_rows(
        self, scores, rows, threshold: float, top_k: int
    ) -> list[dict]:
        """Row hits → frontend events (shared by image and hybrid search)."""
        from evr_tpu.query.events import format_event_for_frontend

        results = []
        for score, row in zip(scores, rows):
            score = float(score)
            if not np.isfinite(score) or score < threshold:
                continue
            video, frame_name, _ = self.index.resolve_row(int(row))
            hit_frame = None
            try:
                frameidx = int(frame_name.rsplit(".", 1)[0])
                hit_frame = self.metadata.frame_by_idx(video, frameidx)
            except ValueError:
                pass
            if hit_frame is None:
                continue
            event = format_event_for_frontend(
                {**hit_frame.raw, "clip_similarity": score},
                fps=self.metadata.fps(video),
            )
            event["clip_similarity"] = score
            results.append(event)
        results.sort(key=lambda e: e.get("clip_similarity", 0), reverse=True)
        return results[:top_k]

    def search_hybrid(
        self,
        source: str,
        query: str,
        image_weight: float,
        threshold: float,
        top_k: int,
        video_name: str | None = None,
    ) -> list[dict]:
        """Image+text hybrid search: one composite direction
        ``normalise(α·v_image + (1−α)·v_text)`` — "frames like this image
        that also match this text". A single query vector, so the standard
        index dispatch (exact / IVF / scoped) serves it unchanged. CLIP
        image and text embeddings live in the same contrastive space, which
        is what makes the straight blend meaningful.

        No reference counterpart (the reference searches image XOR text).
        """
        img = self.load_image_source(source)
        staged = self._stage(np.ascontiguousarray(np.asarray(img)))
        v_img = np.asarray(
            self.engine.encode_staged_images(staged[None], normalise=True)[0],
            np.float32,
        )
        processed = self.query_engine.preprocess(query)
        v_txt = np.asarray(
            self.engine.get_text_features(processed), np.float32
        ).reshape(-1)
        v_txt /= max(float(np.linalg.norm(v_txt)), 1e-12)
        v = image_weight * v_img + (1.0 - image_weight) * v_txt
        v /= max(float(np.linalg.norm(v)), 1e-12)
        scores, rows = self.index.search_raw(v[None], top_k * 3, video_name)
        return self._events_from_rows(scores[0], rows[0], threshold, top_k)
