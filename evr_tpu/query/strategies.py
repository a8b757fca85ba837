"""The 7 retrieval strategies.

Behavioral parity with `Backend/query_strategies.py` (the versions the API
routes actually dispatch — SURVEY.md §1 coupling notes):

| method              | reference                                   |
|---------------------|---------------------------------------------|
| text_clip           | `query_by_text_clip` (:36-119)              |
| text_adaptive       | `query_by_text_with_adaptive_threshold` (:121-186) |
| keyword_only        | `query_by_keyword` (:188-251)               |
| text_keyword        | `query_by_text_and_keyword` (:253-361)      |
| object_only         | `query_by_object` (:363-464)                |
| text_object         | `query_by_text_and_object` (:466-599)       |
| text_object_keyword | `query_by_text_object_and_keyword` (:601-775) |

Shared semantics preserved: query preprocessing hook, top_k×3 candidate
over-fetch, per-strategy threshold rules (object_only caps its threshold at
0.65), confidence fusion (max of the participating signals), detection_type
tags, and descending-confidence sort.

TPU-native difference: candidates come from ONE batched GEMM + top-k with
scores attached (`FrameIndex.search`), and metadata probes are O(1) hash
lookups (`MetadataStore`) — the reference's per-frame re-scoring and O(k·N)
JSON scans are gone.

One deliberate divergence: the reference pre-filters keyword matches to the
top_k×3 highest-confidence keyword frames and intersects candidates with
that set (`search_service.py:25-58` + `query_strategies.py:289-295`), so
with more than top_k×3 matching frames it silently drops valid
intersections. Here the keyword predicate is evaluated directly on each
CLIP candidate — a strict superset of the reference's results, identical
whenever the reference's cap doesn't truncate.
"""

from __future__ import annotations

from typing import Callable

import math

from evr_tpu.index.store import FrameIndex, SearchHit


def _np_isfinite(x) -> bool:
    return math.isfinite(float(x))
from .events import format_event_for_frontend
from .metadata import MetadataStore
from .text import QueryPreprocessor, identity_preprocessor

OBJECT_ONLY_THRESHOLD_CAP = 0.65  # `query_strategies.py:443`
CANDIDATE_OVERFETCH = 3  # `query_strategies.py:141` top_k*3


class QueryEngine:
    def __init__(
        self,
        embedding_engine,
        index: FrameIndex,
        metadata: MetadataStore,
        preprocessor: QueryPreprocessor | None = None,
        batch_window_ms: float | None = None,
    ):
        self.engine = embedding_engine
        self.index = index
        self.metadata = metadata
        self.preprocess = preprocessor or identity_preprocessor
        # Fused one-dispatch searcher (tokenize → encode → GEMM → top-k in a
        # single jitted call); falls back to the two-step path for engines
        # without the full interface (e.g. test stubs). batch_window_ms
        # additionally coalesces concurrent queries into one dispatch.
        self._searcher = None
        use_fused = (
            hasattr(embedding_engine, "tokenizer")
            and hasattr(embedding_engine, "params")
            # The fused searcher runs the exact GEMM over the index
            # snapshot; an IVF/IVF-PQ-tier index must dispatch through
            # FrameIndex.search so queries actually probe the inverted
            # lists (the two-step path still caches text features — at
            # that scale the candidate GEMM dominates, not the encode).
            and getattr(index, "search_impl", None) not in ("ivf", "ivfpq")
        )
        if use_fused:
            from evr_tpu.index.fused_search import TextSearcher

            self._searcher = TextSearcher(
                embedding_engine, index, batch_window_ms=batch_window_ms
            )
        # ANN serving tier keeps micro-batching even though the fused
        # searcher is disabled (VERDICT r3 #4): concurrent global searches
        # coalesce into ONE probe dispatch — the device ADC/probe scores a
        # batch of 8 for nearly the cost of 1 (PERF.md 10M table), so
        # under concurrent load per-query latency drops instead of
        # serializing on the index lock. Scoped searches stay per-call
        # (they run the small exact path).
        self._ann_batcher = None
        if (
            self._searcher is None
            and batch_window_ms is not None
            and getattr(index, "search_impl", None) in ("ivf", "ivfpq")
        ):
            from evr_tpu.serving.batcher import MicroBatcher, flush_padded

            def _ann_batch(key, items):
                k_ = key
                import numpy as _np

                return flush_padded(
                    items,
                    8,
                    lambda padded: self.index.search_raw(
                        _np.stack(
                            [_np.asarray(v, _np.float32).reshape(-1)
                             for v in padded]
                        ),
                        k_,
                    ),
                )

            self._ann_batcher = MicroBatcher(
                _ann_batch, max_batch=8, window_s=batch_window_ms / 1e3
            )

    # -- shared plumbing --------------------------------------------------
    def _candidates(
        self, processed_text: str, top_k: int, video_name: str | None
    ) -> list[SearchHit]:
        return self._candidates_n(
            processed_text, top_k * CANDIDATE_OVERFETCH, video_name
        )

    def _candidates_n(
        self, processed_text: str, k: int, video_name: str | None
    ) -> list[SearchHit]:
        if self._searcher is not None:
            scores, rows = self._searcher.search(processed_text, k, video_name)
            hits = []
            for score, row in zip(scores[0], rows[0]):
                if not _np_isfinite(score):
                    continue
                video, frame, fidx = self.index.resolve_row(int(row))
                hits.append(SearchHit(video, frame, float(score), int(row), fidx))
            return hits
        vec = self.engine.get_text_features(processed_text)
        if self._ann_batcher is not None and video_name is None:
            scores, rows = self._ann_batcher.submit(k, vec)
            hits = []
            for score, row in zip(scores, rows):
                if not _np_isfinite(score):
                    continue
                video, frame, fidx = self.index.resolve_row(int(row))
                hits.append(
                    SearchHit(video, frame, float(score), int(row), fidx)
                )
            return hits
        return self.index.search(vec, k, video_name)[0]

    def _negative_vec(
        self, processed_text: str, negative_query: str, weight: float
    ):
        """Composite query direction ``normalise(q⁺ − w·q⁻)``: one vector,
        so the downstream dispatch (exact GEMM, IVF probe, video grouping)
        is unchanged. Both encodes hit the engine's text-feature cache."""
        import numpy as _np

        vp = _np.asarray(
            self.engine.get_text_features(processed_text), _np.float32
        ).reshape(-1)
        vn = _np.asarray(
            self.engine.get_text_features(self.preprocess(negative_query)),
            _np.float32,
        ).reshape(-1)
        vp = vp / max(float(_np.linalg.norm(vp)), 1e-12)
        vn = vn / max(float(_np.linalg.norm(vn)), 1e-12)
        v = vp - float(weight) * vn
        return v / max(float(_np.linalg.norm(v)), 1e-12)

    def _candidates_negative(
        self,
        processed_text: str,
        negative_query: str,
        negative_weight: float,
        k: int,
        video_name: str | None,
    ) -> list[SearchHit]:
        vec = self._negative_vec(processed_text, negative_query, negative_weight)
        return self.index.search(vec, k, video_name)[0]

    def _frame_for_hit(self, hit: SearchHit):
        try:
            frameidx = int(hit.frame_name.rsplit(".", 1)[0])
        except ValueError:
            return None
        return self.metadata.frame_by_idx(hit.video, frameidx)

    def _format_event(self, video: str, frame, extra: dict) -> dict:
        data = dict(frame.raw)
        data.update(extra)
        return format_event_for_frontend(data, fps=self.metadata.fps(video))

    # -- 1. text_clip -----------------------------------------------------
    def _mmr(self, hits: list[SearchHit], lam: float, k: int) -> list[SearchHit]:
        """Diverse subset selection over candidate hits (`query.diversify`):
        keeps min(k, len) hits balancing relevance against similarity to the
        already-selected set. Embeddings come free from the index (the rows
        that produced the scores); callers may still re-sort the selected
        subset by score for display."""
        import numpy as _np

        from evr_tpu.query.diversify import mmr_select

        # MMR runs on metadata-valid hits only: selecting first and
        # validating after would return fewer than k events while valid
        # candidates sat discarded in the over-fetch.
        hits = [h for h in hits if self._frame_for_hit(h) is not None]
        if not hits:
            return hits
        # get_embeddings normalises the whole per-video matrix per call —
        # fetch once per video, not once per hit
        by_video = {
            v: self.index.get_embeddings(v) for v in {h.video for h in hits}
        }
        vecs = _np.stack([by_video[h.video][h.frame_index] for h in hits])
        return mmr_select(hits, vecs, lam, k)

    def query_text_clip(
        self,
        query: str,
        top_k: int,
        video_name: str | None = None,
        mmr_lambda: float | None = None,
        negative_query: str | None = None,
        negative_weight: float = 0.8,
    ):
        """``negative_query`` ("crowd" but NOT "protest"): candidates are
        scored against the composite direction normalise(q⁺ − w·q⁻), so
        ``clip_similarity`` reflects the composite — frames similar to the
        negative are pushed down the ranking, not hard-filtered."""
        processed = self.preprocess(query)
        if negative_query:
            hits = self._candidates_negative(
                processed, negative_query, negative_weight,
                top_k * CANDIDATE_OVERFETCH, video_name,
            )
        else:
            hits = self._candidates(processed, top_k, video_name)
        if mmr_lambda is not None:
            hits = self._mmr(hits, mmr_lambda, top_k)
        results = []
        for hit in hits:
            frame = self._frame_for_hit(hit)
            if frame is None:
                continue
            event = self._format_event(hit.video, frame, {"clip_similarity": hit.score})
            event["clip_similarity"] = hit.score
            results.append(event)
        results.sort(key=lambda e: e.get("clip_similarity", 0), reverse=True)
        return results[:top_k]

    # -- temporal chain search (beyond-reference capability) ---------------
    def query_temporal(
        self,
        queries: list[str],
        top_k: int = 5,
        max_gap: int | None = None,
        video_name: str | None = None,
    ):
        """Ordered multi-event chains ("X, then Y, then Z"): one batched
        text encode for all sub-queries, one GEMM per candidate video, and
        an exact O(K·n) DP over the frame axis (`query.temporal`). Each
        result is the first step's event dict plus ``chain`` (per-step
        events) and ``total_score``."""
        from evr_tpu.query.temporal import temporal_search

        if len(queries) < 2:
            raise ValueError("temporal search needs at least 2 sub-queries")
        processed = [self.preprocess(q) for q in queries]
        chains = temporal_search(
            self.engine.encode_texts, self.index, processed,
            top_k=top_k, max_gap=max_gap, video_name=video_name,
        )
        results = []
        for ch in chains:
            steps = []
            for fname, score in zip(ch.frame_names, ch.step_scores):
                hit = SearchHit(ch.video, fname, score, -1, -1)
                frame = self._frame_for_hit(hit)
                if frame is None:
                    steps.append(
                        {"video": ch.video, "frame": fname,
                         "clip_similarity": score}
                    )
                    continue
                ev = self._format_event(
                    ch.video, frame, {"clip_similarity": score}
                )
                ev["clip_similarity"] = score
                steps.append(ev)
            entry = dict(steps[0]) if steps else {"video": ch.video}
            entry["chain"] = steps
            entry["total_score"] = ch.total_score
            results.append(entry)
        return results

    # -- 2. text_adaptive -------------------------------------------------
    def query_text_adaptive(
        self,
        query: str,
        adaptive_threshold: float,
        top_k: int,
        video_name: str | None = None,
        mmr_lambda: float | None = None,
    ):
        processed = self.preprocess(query)
        hits = [
            h
            for h in self._candidates(processed, top_k, video_name)
            if h.score >= adaptive_threshold
        ]
        if mmr_lambda is not None:
            hits = self._mmr(hits, mmr_lambda, top_k)
        results = []
        for hit in hits:
            frame = self._frame_for_hit(hit)
            if frame is None:
                continue
            event = self._format_event(hit.video, frame, {"clip_similarity": hit.score})
            event["clip_similarity"] = hit.score
            results.append(event)
        results.sort(key=lambda e: e.get("clip_similarity", 0), reverse=True)
        return results[:top_k]

    # -- 3. keyword_only --------------------------------------------------
    def query_keyword(
        self,
        keyword: str,
        adaptive_threshold: float,
        top_k: int,
        video_name: str | None = None,
    ):
        videos = [video_name] if video_name else self.metadata.videos()
        results = []
        for video in videos:
            for frame in self.metadata.frames(video):
                conf = self.metadata.keyword_best_match(frame, keyword)
                if conf > 0.0 and conf >= adaptive_threshold:
                    event = self._format_event(
                        video, frame, {"text_confidence": conf, "clip_similarity": 0.0}
                    )
                    results.append(event)
        results.sort(key=lambda e: e.get("confidence", 0), reverse=True)
        return results[:top_k]

    # -- 4. text_keyword --------------------------------------------------
    def query_text_keyword(
        self,
        query: str,
        adaptive_threshold: float,
        top_k: int,
        keyword: str | None = None,
        text_confidence: float | None = None,
        video_name: str | None = None,
    ):
        keyword_to_use = keyword if keyword else query
        keyword_threshold = (
            text_confidence if text_confidence is not None else adaptive_threshold
        )
        processed = self.preprocess(query)
        results = []
        for hit in self._candidates(processed, top_k, video_name):
            if hit.score < adaptive_threshold:
                continue
            frame = self._frame_for_hit(hit)
            if frame is None:
                continue
            text_conf = self.metadata.keyword_best_match(frame, keyword_to_use)
            if text_conf <= 0.0 or text_conf < keyword_threshold:
                continue
            event = self._format_event(
                hit.video,
                frame,
                {
                    "clip_similarity": hit.score,
                    "text_confidence": text_conf,
                    "object_confidence": 0.0,
                },
            )
            event["confidence"] = max(hit.score, text_conf)
            event["clip_similarity"] = hit.score
            event["text_confidence"] = text_conf
            event["detection_type"] = "text+clip"
            results.append(event)
        results.sort(key=lambda e: e["confidence"], reverse=True)
        return results[:top_k]

    # -- 5. object_only ---------------------------------------------------
    def query_object(
        self,
        query: str,
        adaptive_threshold: float,
        top_k: int,
        video_name: str | None = None,
    ):
        actual_threshold = min(adaptive_threshold, OBJECT_ONLY_THRESHOLD_CAP)
        videos = [video_name] if video_name else self.metadata.videos()
        results = []
        for video in videos:
            for frame in self.metadata.frames(video):
                found, conf, label = self.metadata.object_best_match(
                    frame, query, include_ocr=True
                )
                if found and conf >= actual_threshold:
                    event = self._format_event(
                        video,
                        frame,
                        {
                            "object_confidence": conf,
                            "detection_type": "object",
                            "object_label": label,
                        },
                    )
                    results.append(event)
        results.sort(key=lambda e: e["confidence"], reverse=True)
        return results[:top_k]

    # -- 6. text_object ---------------------------------------------------
    def query_text_object(
        self,
        query: str,
        adaptive_threshold: float,
        top_k: int,
        object_keyword: str | None = None,
        object_confidence: float | None = None,
        video_name: str | None = None,
    ):
        object_to_use = object_keyword if object_keyword else query
        obj_threshold = (
            object_confidence if object_confidence is not None else adaptive_threshold
        )
        processed = self.preprocess(query)
        results = []
        for hit in self._candidates(processed, top_k, video_name):
            if hit.score < adaptive_threshold:
                continue
            frame = self._frame_for_hit(hit)
            if frame is None:
                continue
            # reference `query_by_text_and_object` checks sources 1-3 only
            found, obj_conf, label = self.metadata.object_best_match(
                frame, object_to_use, include_ocr=False
            )
            if not found or obj_conf < obj_threshold:
                continue
            event = self._format_event(
                hit.video,
                frame,
                {
                    "clip_similarity": hit.score,
                    "object_confidence": obj_conf,
                    "text_confidence": 0.0,
                    "object_label": label,
                },
            )
            event["confidence"] = max(hit.score, obj_conf)
            event["clip_similarity"] = hit.score
            event["object_confidence"] = obj_conf
            event["detection_type"] = "object+clip"
            results.append(event)
        results.sort(key=lambda e: e["confidence"], reverse=True)
        return results[:top_k]

    # -- 7. text_object_keyword -------------------------------------------
    def query_text_object_keyword(
        self,
        query: str,
        adaptive_threshold: float,
        top_k: int,
        keyword: str | None = None,
        text_confidence: float | None = None,
        object_keyword: str | None = None,
        object_confidence: float | None = None,
        video_name: str | None = None,
    ):
        keyword_to_use = keyword if keyword else query
        object_to_use = object_keyword if object_keyword else query
        keyword_threshold = (
            text_confidence if text_confidence is not None else adaptive_threshold
        )
        obj_threshold = (
            object_confidence if object_confidence is not None else adaptive_threshold
        )
        processed = self.preprocess(query)
        results = []
        for hit in self._candidates(processed, top_k, video_name):
            if hit.score < adaptive_threshold:
                continue
            frame = self._frame_for_hit(hit)
            if frame is None:
                continue
            text_conf = self.metadata.keyword_best_match(frame, keyword_to_use)
            if text_conf <= 0.0 or text_conf < keyword_threshold:
                continue
            # triple strategy checks all 4 object sources incl. OCR×0.7
            found, obj_conf, label = self.metadata.object_best_match(
                frame, object_to_use, include_ocr=True
            )
            if not found or obj_conf < obj_threshold:
                continue
            event = self._format_event(
                hit.video,
                frame,
                {
                    "clip_similarity": hit.score,
                    "text_confidence": text_conf,
                    "object_confidence": obj_conf,
                    "object_label": label,
                },
            )
            event["confidence"] = max(hit.score, text_conf, obj_conf)
            event["clip_similarity"] = hit.score
            event["text_confidence"] = text_conf
            event["object_confidence"] = obj_conf
            event["detection_type"] = "text+object+clip"
            results.append(event)
        results.sort(key=lambda e: e["confidence"], reverse=True)
        return results[:top_k]

    # -- speech strategies (beyond-reference: searchable ASR transcripts) --
    def query_speech(
        self,
        keyword: str,
        top_k: int,
        video_name: str | None = None,
    ):
        """Frames inside transcript segments whose spoken text contains the
        keyword (accent-insensitive). Beyond-reference: the reference probed
        Whisper subtitles (`content/file_test_prob/test_subtitles.py`) but
        never indexed them; here transcripts are a first-class match source
        like OCR text. Flat SPEECH_CONF confidence (greedy ASR carries no
        per-word score); events carry the matched segment text + bounds."""
        from .metadata import SPEECH_CONF

        videos = [video_name] if video_name else self.metadata.videos()
        results = []
        for video in videos:
            for frame, seg_text in self.metadata.speech_frames(video, keyword):
                event = self._format_event(video, frame, {"clip_similarity": 0.0})
                event["confidence"] = SPEECH_CONF
                event["speech_confidence"] = SPEECH_CONF
                event["speech_text"] = seg_text
                event["detection_type"] = "speech"
                results.append(event)
        results.sort(key=lambda e: e.get("confidence", 0), reverse=True)
        return results[:top_k]

    def query_text_speech(
        self,
        query: str,
        adaptive_threshold: float,
        top_k: int,
        keyword: str | None = None,
        video_name: str | None = None,
    ):
        """CLIP semantic candidates restricted to frames whose covering
        transcript segment contains the keyword — the speech analog of
        text_keyword (same fusion: confidence = max(clip, speech))."""
        keyword_to_use = keyword if keyword else query
        processed = self.preprocess(query)
        results = []
        for hit in self._candidates(processed, top_k, video_name):
            if hit.score < adaptive_threshold:
                continue
            frame = self._frame_for_hit(hit)
            if frame is None:
                continue
            conf, seg_text = self.metadata.speech_best_match(
                hit.video, frame, keyword_to_use
            )
            if conf <= 0.0:
                continue
            event = self._format_event(
                hit.video, frame, {"clip_similarity": hit.score}
            )
            event["confidence"] = max(hit.score, conf)
            event["clip_similarity"] = hit.score
            event["speech_confidence"] = conf
            event["speech_text"] = seg_text
            event["detection_type"] = "speech+clip"
            results.append(event)
        results.sort(key=lambda e: e["confidence"], reverse=True)
        return results[:top_k]

    # -- video-level retrieval (beyond-reference capability) ---------------
    def query_videos(
        self,
        query: str,
        top_k: int = 5,
        frames_per_video: int = 3,
        video_name: str | None = None,
    ):
        """Rank VIDEOS (not frames) for a query: each video scores the mean
        of its top-``frames_per_video`` frame similarities — robust against
        a single fluke frame, unlike a plain max, and against length bias,
        unlike a mean over all frames. One over-fetched candidate search
        (the same fused/exact dispatch every strategy uses), then a host
        group-by over the handful of returned hits.

        Returns one event per video — the best frame's event dict (so the
        frontend renders it like any other result) with ``video_score``
        (drives ``confidence``/rank), ``matched_frames`` and
        ``top_frames`` added.
        """
        processed = self.preprocess(query)
        total = self.index.total_frames
        if total == 0:
            return []
        # over-fetch enough rows that top_k videos can each surface several
        # frames even when one video dominates the global top of the list
        k = min(total, max(top_k * 20, 100))
        hits = self._candidates_n(processed, k, video_name)
        by_video: dict[str, list[SearchHit]] = {}
        for h in hits:
            by_video.setdefault(h.video, []).append(h)
        scored = []
        for video, hs in by_video.items():
            hs.sort(key=lambda h: h.score, reverse=True)
            top = hs[: max(1, frames_per_video)]
            scored.append((sum(h.score for h in top) / len(top), video, hs))
        scored.sort(key=lambda t: t[0], reverse=True)
        results = []
        for video_score, video, hs in scored[:top_k]:
            best = hs[0]
            frame = self._frame_for_hit(best)
            if frame is None:
                continue
            event = self._format_event(
                video, frame, {"clip_similarity": best.score}
            )
            event["clip_similarity"] = best.score
            # video-level score outranks the best frame's own confidence
            event["confidence"] = float(video_score)
            event["video_score"] = float(video_score)
            event["matched_frames"] = len(hs)
            event["top_frames"] = [h.frame_name for h in hs[:frames_per_video]]
            results.append(event)
        return results

    # -- dispatch ---------------------------------------------------------
    def search(self, method: str, **kwargs):
        try:
            fn = SEARCH_METHOD_DISPATCH[method]
        except KeyError:
            raise ValueError(
                f"unknown search_method {method!r}; expected one of {sorted(SEARCH_METHOD_DISPATCH)}"
            ) from None
        return fn(self, **kwargs)


SEARCH_METHOD_DISPATCH: dict[str, Callable] = {
    "text_clip": QueryEngine.query_text_clip,
    "text_adaptive": QueryEngine.query_text_adaptive,
    "keyword_only": QueryEngine.query_keyword,
    "text_keyword": QueryEngine.query_text_keyword,
    "object_only": QueryEngine.query_object,
    "text_object": QueryEngine.query_text_object,
    "text_object_keyword": QueryEngine.query_text_object_keyword,
    # beyond-reference: searchable ASR transcripts
    "speech_only": QueryEngine.query_speech,
    "text_speech": QueryEngine.query_text_speech,
    # beyond-reference: video-level ranking
    "video": QueryEngine.query_videos,
}

SEARCH_METHODS = tuple(SEARCH_METHOD_DISPATCH)
