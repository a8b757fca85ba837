"""HTTP API — the reference's 12 routes on a werkzeug WSGI app.

Route/response parity with `Backend/app.py` (line refs per route below);
differences are deliberate: no debug-mode threaded Flask dev server, CORS
headers on every response, structured JSON errors, and no network calls on
the query path.

Run: ``python -m evr_tpu.serving --data-root data --port 5000``.
"""

from __future__ import annotations

import json
import pathlib
import time

from werkzeug.exceptions import HTTPException, NotFound
from werkzeug.routing import RequestRedirect
from werkzeug.routing import Map, Rule
from werkzeug.utils import secure_filename
from werkzeug.wrappers import Request, Response

from .context import ServingContext


def _json(payload, status: int = 200) -> Response:
    resp = Response(
        json.dumps(payload, ensure_ascii=False), status=status, mimetype="application/json"
    )
    resp.headers["Access-Control-Allow-Origin"] = "*"
    resp.headers["Access-Control-Allow-Headers"] = "Content-Type"
    resp.headers["Access-Control-Allow-Methods"] = "GET, POST, OPTIONS"
    return resp


def _file(path, mimetype: str, environ=None) -> Response:
    """Serve a file with HTTP Range / conditional support when the request
    environ is available: Accept-Ranges + 206/Content-Range for partial
    requests (browser ``<video>`` seeking — the product's core interaction)
    and ETag/304 revalidation. The reference gets this from Flask's
    ``send_file`` (`Backend/app.py:742-759`); werkzeug's provides the same.
    """
    if environ is not None:
        from werkzeug.exceptions import RequestedRangeNotSatisfiable
        from werkzeug.utils import send_file

        try:
            resp = send_file(
                pathlib.Path(path), environ, mimetype=mimetype, conditional=True
            )
        except RequestedRangeNotSatisfiable as e:
            resp = e.get_response(environ)
        # advertise range support on full 200s too (werkzeug only sets this
        # on 206) so browsers know seeking is cheap before the first probe
        resp.headers.setdefault("Accept-Ranges", "bytes")
    else:
        resp = Response(pathlib.Path(path).read_bytes(), mimetype=mimetype)
    resp.headers["Access-Control-Allow-Origin"] = "*"
    return resp


def create_app(ctx: ServingContext, frontend_dist: str | None = None):
    """``frontend_dist``: optional directory of a built SPA (e.g. the
    reference React app's `vite build` output) served at ``/app/``; the
    JSON API lives unchanged under ``/api/`` so the frontend needs no
    code changes."""
    url_map = Map(
        [
            Rule("/", endpoint="index", methods=["GET"]),
            Rule("/app/", endpoint="frontend", defaults={"asset": "index.html"}, methods=["GET"]),
            Rule("/app/<path:asset>", endpoint="frontend", methods=["GET"]),
            Rule("/api/videos", endpoint="videos", methods=["GET"]),
            Rule(
                "/api/video/<video_id>/events", endpoint="video_events", methods=["GET"]
            ),
            Rule("/api/search", endpoint="search", methods=["POST"]),
            Rule("/api/upload-video", endpoint="upload", methods=["POST"]),
            Rule(
                "/api/upload-status/<job_id>",
                endpoint="upload_status",
                methods=["GET"],
            ),
            Rule("/api/frame/<path:frame_path>", endpoint="frame", methods=["GET"]),
            Rule("/api/video/<path:video_path>", endpoint="video_file", methods=["GET"]),
            Rule("/api/transcribe-voice", endpoint="transcribe", methods=["POST"]),
            Rule("/api/visualization/umap", endpoint="umap", methods=["POST"]),
            Rule("/api/videos/available", endpoint="available", methods=["GET"]),
            Rule("/health", endpoint="health", methods=["GET"]),
            Rule("/api/models", endpoint="models", methods=["GET"]),
            Rule("/api/models/active", endpoint="active_model", methods=["GET", "POST"]),
            # additive observability route (no reference counterpart — the
            # reference's only instrumentation is stdout prints, SURVEY §5.1)
            Rule("/api/stats", endpoint="stats", methods=["GET"]),
        ]
    )

    # -- endpoints --------------------------------------------------------

    def ep_health(request):  # app.py:909-912
        return _json({"status": "ok"})

    def ep_index(request):
        from .ui import INDEX_HTML

        resp = Response(INDEX_HTML, mimetype="text/html")
        resp.headers["Access-Control-Allow-Origin"] = "*"
        return resp

    def ep_frontend(request, asset):
        import mimetypes

        if frontend_dist is None:
            return _json({"error": "no frontend dist configured (--frontend-dist)"}, 404)
        root = pathlib.Path(frontend_dist).resolve()
        target = (root / asset).resolve()
        if not target.is_relative_to(root):
            return _json({"error": "not found"}, 404)
        if not target.is_file():
            # SPA fallback: unknown client-side routes serve index.html
            target = root / "index.html"
            if not target.is_file():
                return _json({"error": "not found"}, 404)
        mimetype = mimetypes.guess_type(str(target))[0] or "application/octet-stream"
        return _file(target, mimetype, request.environ)

    def ep_videos(request):  # app.py:221-303
        ctx.prune_missing()
        videos = []
        for idx, name in enumerate(ctx.video_names(), 1):
            summary = ctx.video_summary(idx, name)
            if summary is not None:
                videos.append(summary)
        return _json(videos)

    def ep_video_events(request, video_id):  # app.py:305-379
        name = ctx.video_name_from_id(video_id)
        if name is None:
            return _json({"error": f"Video with ID {video_id} not found"}, 404)
        from evr_tpu.query.events import format_event_for_frontend

        fps = ctx.metadata.fps(name)
        events = [
            format_event_for_frontend(fr.raw, fps=fps)
            for fr in ctx.metadata.frames(name)
        ]
        if len(events) > 20:  # reference subsampling to ≤20 markers
            step = len(events) // 20
            events = [events[i] for i in range(0, len(events), step)][:20]
        return _json(events)

    def ep_stats(request):
        from evr_tpu.utils import Timer

        return _json(
            {
                "timings": Timer.report(),
                "index": {
                    "videos": sum(len(i.videos) for i in ctx._indexes.values()),
                    "frames": sum(i.total_frames for i in ctx._indexes.values()),
                    "per_model": {
                        m: {"videos": len(i.videos), "frames": i.total_frames}
                        for m, i in ctx._indexes.items()
                    },
                    "version": ctx.index.version,
                },
                "caches": {
                    "search": len(ctx.search_cache),
                    "viz": len(ctx.viz_cache),
                },
                "active_model": ctx.engine.active_model,
            }
        )

    def ep_search(request):  # app.py:381-613
        from evr_tpu.utils import Timer

        start_time = time.time()
        data = request.get_json(silent=True) or {}
        if not isinstance(data, dict):
            return _json({"error": "request body must be a JSON object"}, 400)
        search_type = data.get("search_type", "text")
        query = data.get("query", "")
        image_url = data.get("image_url")
        try:
            top_k = int(data.get("top_k", 10))
            adaptive_threshold = float(data.get("adaptive_threshold", 0.5))
            text_confidence = float(data.get("text_confidence", adaptive_threshold))
            object_confidence = float(
                data.get("object_confidence", adaptive_threshold)
            )
        except (TypeError, ValueError):
            return _json(
                {"error": "top_k / threshold fields must be numeric"}, 400
            )
        mmr_lambda = data.get("mmr_lambda")
        if mmr_lambda is not None:
            try:
                mmr_lambda = float(mmr_lambda)
            except (TypeError, ValueError):
                return _json({"error": "mmr_lambda must be numeric"}, 400)
            if not 0.0 <= mmr_lambda <= 1.0:
                return _json({"error": "mmr_lambda must be in [0, 1]"}, 400)
        negative_query = data.get("negative_query")
        if negative_query is not None and not isinstance(negative_query, str):
            return _json({"error": "negative_query must be a string"}, 400)
        try:
            negative_weight = float(data.get("negative_weight", 0.8))
        except (TypeError, ValueError):
            return _json({"error": "negative_weight must be numeric"}, 400)
        if not 0.0 <= negative_weight <= 10.0:
            # a negative weight would silently AMPLIFY the negative query
            return _json({"error": "negative_weight must be in [0, 10]"}, 400)
        try:
            image_weight = float(data.get("image_weight", 0.5))
        except (TypeError, ValueError):
            return _json({"error": "image_weight must be numeric"}, 400)
        if not 0.0 <= image_weight <= 1.0:
            return _json({"error": "image_weight must be in [0, 1]"}, 400)
        search_method = data.get("search_method", "text")
        keyword = data.get("keyword", "")
        object_keyword = data.get("object", "")
        enable_clip_similarity = data.get("enableClipSimilarity", False)
        model_name = data.get("model", "original")
        # adversarial-input armor: every free-form field the strategies /
        # tokenizer / cache key consume must be a string (a dict or list
        # here used to surface as a 500 deep inside tokenization)
        for field, v in (
            ("search_type", search_type), ("query", query),
            ("search_method", search_method), ("keyword", keyword),
            ("object", object_keyword), ("model", model_name),
        ):
            if not isinstance(v, str):
                return _json({"error": f"{field} must be a string"}, 400)
        if image_url is not None and not isinstance(image_url, str):
            return _json({"error": "image_url must be a string"}, 400)
        # mmr_lambda / negative_query only act on specific strategies —
        # reject rather than silently ignore them elsewhere (a 200 with
        # un-negated results is worse than a 400). "text" is the default
        # label for the text_adaptive fallback branch below.
        _method_eff = "text_adaptive" if search_method == "text" else search_method
        if mmr_lambda is not None and _method_eff not in (
            "text_clip", "text_adaptive"
        ):
            return _json(
                {"error": "mmr_lambda is only supported for "
                          "text_clip/text_adaptive"}, 400
            )
        if negative_query and _method_eff != "text_clip":
            return _json(
                {"error": "negative_query is only supported for text_clip"},
                400,
            )
        queries_list = data.get("queries")
        max_gap = data.get("max_gap")
        if search_method == "temporal":
            if (
                not isinstance(queries_list, list)
                or len(queries_list) < 2
                or not all(isinstance(q, str) and q for q in queries_list)
            ):
                return _json(
                    {"error": "temporal search needs 'queries': "
                              "a list of >= 2 non-empty strings"}, 400
                )
            if max_gap is not None:
                try:
                    max_gap = int(max_gap)
                except (TypeError, ValueError):
                    return _json({"error": "max_gap must be an integer"}, 400)
        if model_name != ctx.engine.active_model:
            ctx.engine.set_active_model(model_name)

        video_name = ctx.video_name_from_id(data.get("videoId") or "")

        # result cache (CacheService search-results parity, cache_service.py
        # :242-255): keyed by the full request semantics + index version,
        # invalidated by ingest. Build first so the version is stable.
        ctx.index._ensure_built()
        cache_key = (
            model_name, ctx.index.version, search_type, query, image_url,
            top_k, adaptive_threshold, text_confidence, object_confidence,
            search_method, keyword, object_keyword, bool(enable_clip_similarity),
            video_name, tuple(queries_list or ()), max_gap, mmr_lambda,
            negative_query, negative_weight, image_weight,
        )
        cached = ctx.search_cache.get(cache_key)
        if cached is not None:
            return _json(cached)

        qe = ctx.query_engine
        results: list[dict] = []
        if search_type == "image" and image_url:
            try:
                results = ctx.search_by_image(
                    image_url, adaptive_threshold, top_k, video_name
                )
            except ValueError as e:
                return _json({"error": str(e)}, 400)
        elif search_type == "hybrid":
            # beyond-reference: image+text composite direction
            if not (image_url and query):
                return _json(
                    {"error": "hybrid search needs both image_url and query"},
                    400,
                )
            try:
                results = ctx.search_hybrid(
                    image_url, query, image_weight, adaptive_threshold,
                    top_k, video_name,
                )
            except ValueError as e:
                return _json({"error": str(e)}, 400)
        elif search_type == "text" and search_method == "temporal":
            # ordered multi-event chain search (beyond-reference capability)
            results = qe.query_temporal(
                queries_list, top_k=top_k, max_gap=max_gap,
                video_name=video_name,
            )
        elif search_type == "text" and query:
            if search_method == "text_clip":
                results = qe.query_text_clip(
                    query, top_k, video_name, mmr_lambda=mmr_lambda,
                    negative_query=negative_query,
                    negative_weight=negative_weight,
                )
            elif search_method == "video":
                # beyond-reference: rank whole videos, best frame as the event
                results = qe.query_videos(
                    query, top_k=top_k, video_name=video_name
                )
            elif search_method == "keyword_only":
                actual = keyword if keyword else query
                results = qe.query_keyword(actual, text_confidence, top_k, video_name)
            elif search_method == "text_keyword":
                results = qe.query_text_keyword(
                    query,
                    adaptive_threshold,
                    top_k,
                    keyword=keyword if keyword else query,
                    text_confidence=text_confidence,
                    video_name=video_name,
                )
            elif search_method == "object_only":
                actual = object_keyword if object_keyword else query
                results = qe.query_object(actual, object_confidence, top_k, video_name)
            elif search_method == "text_object":
                results = qe.query_text_object(
                    query,
                    adaptive_threshold,
                    top_k,
                    object_keyword=object_keyword if object_keyword else query,
                    object_confidence=object_confidence,
                    video_name=video_name,
                )
            elif search_method == "text_object_keyword":
                results = qe.query_text_object_keyword(
                    query,
                    adaptive_threshold,
                    top_k,
                    keyword=keyword if keyword else query,
                    text_confidence=text_confidence,
                    object_keyword=object_keyword if object_keyword else query,
                    object_confidence=object_confidence,
                    video_name=video_name,
                )
            elif search_method == "speech_only":
                # beyond-reference: searchable ASR transcripts
                actual = keyword if keyword else query
                results = qe.query_speech(actual, top_k, video_name)
            elif search_method == "text_speech":
                results = qe.query_text_speech(
                    query,
                    adaptive_threshold,
                    top_k,
                    keyword=keyword if keyword else query,
                    video_name=video_name,
                )
            else:  # "text_adaptive" and the fallback default
                results = qe.query_text_adaptive(
                    query, adaptive_threshold, top_k, video_name,
                    mmr_lambda=mmr_lambda,
                )

        for r in results:  # field guarantee pass (app.py:556-563)
            r.setdefault("text_confidence", 0.0)
            r.setdefault("object_confidence", 0.0)
            r.setdefault("clip_similarity", 0.0)

        if video_name:  # post-filter (app.py:566-588)
            results = [
                r
                for r in results
                if video_name in (r.get("videoId") or "")
                or (r.get("videoId") or "").endswith(video_name)
            ]

        if (
            search_type in ("image", "hybrid")
            or search_method in ("text_clip", "text_adaptive")
            or enable_clip_similarity
        ):
            results.sort(key=lambda x: x.get("clip_similarity", 0), reverse=True)
        else:
            results.sort(key=lambda x: x.get("confidence", 0), reverse=True)

        from evr_tpu.utils.profiling import _registry, _lock

        with _lock:
            _registry[f"search/{search_method}"].append(time.time() - start_time)
        payload = {"events": results[:top_k]}
        ctx.search_cache.set(cache_key, payload)
        return _json(payload)

    def ep_upload(request):  # app.py:615-691 — but ASYNC by default:
        # the reference ingests synchronously inside the request (the flaw
        # SURVEY §3.1 documents: a long video blocks the server). Here the
        # request only saves the file and enqueues a background ingest job,
        # returning 202 + job id; GET /api/upload-status/<id> reports
        # {state, stage, frames_done, frames_total} and, when done, the full
        # legacy payload. Pass form field sync=1 for the blocking behavior.
        video_file = request.files.get("video")
        if not video_file:
            return _json({"error": "No video uploaded"}, 400)
        filename = secure_filename(video_file.filename or "upload.mp4")
        video_name = pathlib.Path(filename).stem
        save_dir = ctx.data_root.video_dir / video_name
        save_dir.mkdir(parents=True, exist_ok=True)
        save_path = save_dir / filename
        video_file.save(str(save_path))

        model_name = request.form.get("model", "original")
        if model_name != ctx.engine.active_model:
            ctx.engine.set_active_model(model_name)

        def run_ingest(progress):
            result = ctx.ingest(save_path, video_name, progress=progress)
            return ctx.upload_payload(save_path, video_name, model_name, result)

        job_id = ctx.ingest_jobs.submit(video_name, run_ingest)
        sync = request.form.get("sync", "").lower() in ("1", "true", "yes")
        if sync:
            job = ctx.ingest_jobs.wait(job_id)
            if job.state == "error":
                return _json({"error": f"Ingest failed: {job.error}"}, 500)
            return _json(job.result)
        return _json(
            {
                "status": "processing",
                "job_id": job_id,
                "video_name": video_name,
                "status_url": f"/api/upload-status/{job_id}",
            },
            202,
        )

    def ep_upload_status(request, job_id):
        status = ctx.ingest_jobs.status(job_id)
        if status is None:
            return _json({"error": f"Unknown upload job {job_id}"}, 404)
        return _json(status)

    def _safe_under_data_root(candidate: pathlib.Path) -> bool:
        """Only serve files that live under the data root — the reference
        serves ANY existing path (`app.py:698-700`), a path-traversal hole
        this rebuild deliberately closes."""
        try:
            resolved = candidate.resolve()
        except OSError:
            return False
        root = ctx.data_root.root.resolve()
        return resolved.is_file() and resolved.is_relative_to(root)

    def ep_frame(request, frame_path):  # app.py:693-734
        candidate = pathlib.Path(frame_path)
        if _safe_under_data_root(candidate):
            return _file(candidate.resolve(), "image/jpeg", request.environ)
        # PureWindowsPath splits on BOTH / and \ — the reference's shipped
        # fixture metadata carries Windows filepaths (E:\...\14187.jpg, see
        # Backend/metadata/video_test_4_metadata.json) that flow into
        # /api/frame/<path> via thumbnailUrl; PurePosixPath left the whole
        # backslash string as the "name" and every thumbnail 404'd.
        frame_name = pathlib.PureWindowsPath(frame_path).name
        for name in ctx.video_names():
            entry = ctx.registry.get(name) or {}
            frames_dir = entry.get("frames_dir")
            if frames_dir:
                base = ctx.resolve_path(frames_dir)
                p = (base / frame_name).resolve()
                if p.is_file() and p.parent == base.resolve():
                    return _file(p, "image/jpeg", request.environ)
        return _json({"error": f"Frame {frame_path} not found"}, 404)

    def ep_video_file(request, video_path):  # app.py:736-764
        candidate = pathlib.Path(video_path)
        if _safe_under_data_root(candidate):
            return _file(candidate.resolve(), "video/mp4", request.environ)
        base = pathlib.PureWindowsPath(video_path).name  # splits / and \
        for name in ctx.video_names():
            entry = ctx.registry.get(name) or {}
            vp = entry.get("video_path", "")
            if name == base or pathlib.Path(vp).name == base:
                resolved = ctx.resolve_path(vp) if vp else None
                if resolved is not None and resolved.exists():
                    return _file(resolved, "video/mp4", request.environ)
        return _json({"error": f"Video {video_path} not found"}, 404)

    def ep_transcribe(request):  # app.py:766-850
        if "audio" not in request.files:
            return _json({"error": "No audio file provided"}, 400)
        audio = request.files["audio"]
        if not audio.filename:
            return _json({"error": "No audio file selected"}, 400)
        if ctx.transcriber is None:
            return _json(
                {"error": "no transcription backend configured on this deployment"},
                501,
            )
        language = request.form.get("language", "en_us")
        tmp_name = secure_filename(f"voice_{int(time.time())}.audio")
        tmp_path = ctx.data_root.root / "voice" / tmp_name
        tmp_path.parent.mkdir(parents=True, exist_ok=True)
        audio.save(str(tmp_path))
        try:
            text = ctx.transcriber(str(tmp_path), language)
        except Exception as e:
            return _json({"error": f"Transcription failed: {e}"}, 500)
        return _json({"text": text, "audio_file": tmp_name})

    def ep_umap(request):  # app.py:852-883
        from evr_tpu.viz import generate_visualization

        data = request.get_json(silent=True) or {}
        if not isinstance(data, dict):
            return _json({"error": "request body must be a JSON object"}, 400)
        video_names = data.get("video_names")
        if video_names is not None and (
            not isinstance(video_names, list)
            or not all(isinstance(v, str) for v in video_names)
        ):
            return _json({"error": "video_names must be a list of strings"}, 400)
        try:
            n_neighbors = int(data.get("n_neighbors", 15))
            min_dist = float(data.get("min_dist", 0.1))
        except (TypeError, ValueError):
            return _json({"error": "n_neighbors/min_dist must be numeric"}, 400)
        metric = data.get("metric", "cosine")
        method = data.get("method", "auto")
        if not isinstance(metric, str) or not isinstance(method, str):
            return _json({"error": "metric/method must be strings"}, 400)
        key = (
            "-".join(sorted(video_names)) if video_names else "all",
            n_neighbors,
            min_dist,
            metric,
            method,
        )
        cached = ctx.viz_cache.get(key)
        if cached is not None:
            return _json(cached)
        result = generate_visualization(
            ctx.index,
            ctx.metadata,
            video_names,
            method=method,
            n_neighbors=n_neighbors,
            min_dist=min_dist,
            metric=metric,
        )
        if result is None:
            return _json({"error": "No embeddings found for visualization"}, 404)
        ctx.viz_cache.set(key, result)
        return _json(result)

    def ep_available(request):  # app.py:885-907
        available = []
        for name in ctx.video_names():
            entry = ctx.registry.get(name) or {}
            emb = entry.get("embeddings_file")
            if not name.startswith("default") and emb and ctx.resolve_path(emb).exists():
                available.append(
                    {
                        "name": name,
                        "embeddings_file": emb,
                        "video_path": entry.get("video_path", ""),
                    }
                )
        return _json({"available_videos": available, "count": len(available)})

    def ep_models(request):  # app.py:914-937
        models = [
            {
                "id": "original",
                "name": f"CLIP Original ({ctx.engine.model_name})",
                "description": "Base CLIP model",
            }
        ]
        for name in ctx.engine.available_models():
            if name != "original":
                models.append(
                    {
                        "id": name,
                        "name": f"CLIP Fine-tuned ({name})",
                        "description": "Fine-tuned CLIP checkpoint",
                    }
                )
        return _json(models)

    def ep_active_model(request):  # app.py:939-966
        if request.method == "GET":
            # surface model/index mismatches the reference leaves silent:
            # searching an index embedded with model A using model B's text
            # tower degrades ranking
            index_models = {
                (ctx.registry.get(n) or {}).get("embedding_model", "original")
                for n in ctx.video_names()
            }
            payload = {"active_model": ctx.engine.active_model}
            mismatched = index_models - {ctx.engine.active_model}
            if index_models and mismatched:
                payload["warning"] = (
                    f"index contains embeddings from models {sorted(index_models)}; "
                    f"queries use {ctx.engine.active_model!r}"
                )
            return _json(payload)
        data = request.get_json(silent=True) or {}
        if not isinstance(data, dict):
            return _json({"error": "request body must be a JSON object"}, 400)
        model_name = data.get("model")
        if not model_name or not isinstance(model_name, str):
            return _json({"error": "Model name is required"}, 400)
        if ctx.engine.set_active_model(model_name):
            return _json({"success": True, "active_model": ctx.engine.active_model})
        return _json(
            {"success": False, "error": f"Failed to set model to {model_name}"}, 400
        )

    endpoints = {
        "health": ep_health,
        "index": ep_index,
        "frontend": ep_frontend,
        "stats": ep_stats,
        "videos": ep_videos,
        "video_events": ep_video_events,
        "search": ep_search,
        "upload": ep_upload,
        "upload_status": ep_upload_status,
        "frame": ep_frame,
        "video_file": ep_video_file,
        "transcribe": ep_transcribe,
        "umap": ep_umap,
        "available": ep_available,
        "models": ep_models,
        "active_model": ep_active_model,
    }

    @Request.application
    def app(request):
        if request.method == "OPTIONS":
            return _json({})
        adapter = url_map.bind_to_environ(request.environ)
        try:
            endpoint, values = adapter.match()
            return endpoints[endpoint](request, **values)
        except RequestRedirect as e:  # e.g. slash-merge normalisation
            return e.get_response(request.environ)
        except NotFound:
            return _json({"error": "not found"}, 404)
        except HTTPException as e:
            return _json({"error": e.description}, e.code or 500)
        except Exception as e:  # blanket 500 with structured body
            return _json({"error": str(e)}, 500)

    app.ctx = ctx
    app.url_map = url_map
    return app
