"""Scripted end-to-end drive of every flow the built-in UI (`serving/ui.py`)
performs, over real HTTP against a live server booted by
`tools/drive_ui_server.py` (the reference's real fixture corpus: 846 frames,
4 videos, real EasyOCR/YOLO annotations).

This is the browser-drive substitute for VERDICT r2 #4's "done" bar: no
browser or JS engine exists on this image, so each fetch the UI's script
makes is issued here exactly as the page would (same routes, same payloads,
same response keys), and the UI-visible invariants are asserted on the
responses.

Usage: python tools/drive_ui_server.py --port 5055 &   # wait for boot
       python tools/drive_ui_flows.py --port 5055
"""

import argparse
import io
import json
import sys
import time
import urllib.request


class Drive:
    def __init__(self, base):
        self.base = base
        self.passed = []

    def get(self, p, timeout=600, headers=None):
        req = urllib.request.Request(self.base + p, headers=headers or {})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, r.read(), dict(r.headers)

    def post_json(self, p, payload, timeout=900):
        req = urllib.request.Request(
            self.base + p,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())

    def ok(self, name, cond, detail=""):
        status = "PASS" if cond else "FAIL"
        print(f"  [{status}] {name}" + (f" — {detail}" if detail else ""),
              flush=True)
        self.passed.append((name, bool(cond)))
        if not cond:
            raise AssertionError(name)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=5055)
    args = ap.parse_args(argv)
    d = Drive(f"http://127.0.0.1:{args.port}")

    print("== UI page ==")
    s, body, _ = d.get("/")
    d.ok("page serves", s == 200 and b"library-grid" in body,
         f"{len(body)} bytes")

    print("== library (VideoLibrary.tsx parity) ==")
    s, body, _ = d.get("/api/videos")
    names = [v["title"] for v in json.loads(body)]
    fixture = {"Violence", "Violence_2", "video_test_3", "video_test_4"}
    d.ok("4 fixture videos listed", s == 200 and fixture <= set(names),
         str(names))
    s, body, h = d.get("/api/frame/Violence/1035.jpg")
    d.ok("thumbnail serves", s == 200 and len(body) > 1000,
         h.get("Content-Type", ""))

    print("== player + timeline (VideoPlayer/Timeline.tsx parity) ==")
    s, body, _ = d.get("/api/video/video-1/events")
    ev = json.loads(body)
    events = ev if isinstance(ev, list) else ev.get("events", [])
    d.ok("events for timeline markers", s == 200 and len(events) > 10,
         f"{len(events)} events")
    ts = [e.get("timestamp", 0) for e in events]
    d.ok("timestamps sane for seek-to-event", all(t >= 0 for t in ts),
         f"max {max(ts):.1f}s")
    s, body, h = d.get("/api/video/Violence.mp4",
                       headers={"Range": "bytes=100-199"})
    d.ok("video Range seek = 206 + Content-Range",
         s == 206 and len(body) == 100
         and (h.get("Content-Range") or "").startswith("bytes 100-199/"),
         h.get("Content-Range", ""))
    s, _, h = d.get("/api/video/Violence.mp4")
    d.ok("full GET advertises Accept-Ranges",
         s == 200 and h.get("Accept-Ranges") == "bytes")

    print("== search panel (AdvancedSearchPanel.tsx parity; real fixture "
          "OCR/YOLO annotations) ==")
    s, r = d.post_json("/api/search", {
        "query": "person", "search_method": "object_only", "top_k": 8})
    d.ok("object_only over real YOLO labels", s == 200
         and len(r["events"]) == 8, f"top conf {r['events'][0]['confidence']:.3f}")
    s, r = d.post_json("/api/search", {
        "query": "anh", "search_method": "keyword_only", "top_k": 8})
    d.ok("keyword_only over real OCR", s == 200 and len(r["events"]) > 0,
         f"{len(r['events'])} hits")
    s, r = d.post_json("/api/search", {
        "query": "a person fighting", "search_method": "text_clip",
        "top_k": 8})
    d.ok("semantic text_clip end-to-end", s == 200 and len(r["events"]) == 8)
    need = {"videoId", "timestamp", "confidence", "clip_similarity",
            "text_confidence", "object_confidence"}
    d.ok("EventData contract fields", need <= set(r["events"][0]))
    s, r = d.post_json("/api/search", {
        "query": "a person fighting", "search_method": "text_object",
        "object": "person", "top_k": 8,
        # the drive engine is random-init (no OpenAI weights on this image)
        # so CLIP cosines sit near 0 — pass the UI's threshold knob low to
        # exercise the combined path's plumbing rather than model quality
        "adaptive_threshold": 0.0, "object_confidence": 0.2})
    d.ok("text_object combined", s == 200 and len(r["events"]) > 0)
    s, r = d.post_json("/api/search", {
        "query": "a person fighting", "search_method": "text_clip",
        "negative_query": "an empty street", "top_k": 8})
    d.ok("negative query", s == 200 and len(r["events"]) == 8)
    s, r = d.post_json("/api/search", {
        "query": "a person fighting", "search_method": "text_adaptive",
        "mmr_lambda": 0.5, "top_k": 8, "adaptive_threshold": 0.0})
    d.ok("MMR diversification", s == 200 and len(r["events"]) > 0)
    s, r = d.post_json("/api/search", {
        "search_type": "text", "search_method": "temporal",
        "queries": ["a person walking", "a person fighting"], "top_k": 5})
    d.ok("temporal chain", s == 200 and isinstance(r["events"], list))
    s, r = d.post_json("/api/search", {
        "query": "fight", "search_method": "video", "top_k": 3,
        "adaptive_threshold": 0.0})
    d.ok("video-level ranking", s == 200 and len(r["events"]) > 0)

    print("== models picker ==")
    s, body, _ = d.get("/api/models")
    d.ok("model list", s == 200 and json.loads(body))

    print("== async upload (VideoLibrary upload-with-progress parity) ==")
    s, body, _ = d.get("/api/video/Violence.mp4")  # reuse a served video's bytes
    vid_bytes = body
    up_name = f"drive_upload_{int(time.time())}"
    boundary = "----evrdrive"
    form = io.BytesIO()
    form.write(f"--{boundary}\r\n".encode())
    form.write(f'Content-Disposition: form-data; name="video"; '
               f'filename="{up_name}.mp4"\r\n'
               f"Content-Type: video/mp4\r\n\r\n".encode())
    form.write(vid_bytes)
    form.write(f"\r\n--{boundary}--\r\n".encode())
    req = urllib.request.Request(
        d.base + "/api/upload-video", data=form.getvalue(),
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        st, up = resp.status, json.loads(resp.read())
    d.ok("upload returns 202 + job id", st == 202 and "job_id" in up,
         up.get("job_id", ""))
    job = up["job_id"]
    stages = set()
    deadline = time.time() + 900
    while time.time() < deadline:
        s, body, _ = d.get(f"/api/upload-status/{job}")
        stat = json.loads(body)
        stages.add(stat.get("stage"))
        if stat.get("state") in ("done", "error"):
            break
        # the server answers searches mid-ingest (the async point)
        s2, r2 = d.post_json("/api/search", {
            "query": "person", "search_method": "object_only", "top_k": 3})
        assert s2 == 200
        time.sleep(2)
    d.ok("ingest job completes", stat.get("state") == "done",
         f"stages seen: {sorted(x for x in stages if x)}")
    s, body, _ = d.get("/api/videos")
    names = [v["title"] for v in json.loads(body)]
    d.ok("uploaded video joins the library", up_name in names, str(names))

    print("== embedding scatter (VisualizationPanel.tsx parity) ==")
    s, r = d.post_json("/api/visualization/umap",
                       {"n_neighbors": 10, "min_dist": 0.1}, timeout=1200)
    coords = r.get("coordinates", [])
    d.ok("umap returns 2-D coordinates for every frame",
         s == 200 and len(coords) > 800
         and all(len(c) == 2 for c in coords[:10])
         and len(r.get("metadata", [])) == len(coords)
         and r["dimensionality_reduction"]["method"] == "umap",
         f"{len(coords)} points, method="
         f"{r['dimensionality_reduction']['method']}")

    print(f"\nALL {len(d.passed)} UI flows PASS over real HTTP "
          f"on the reference fixture corpus")


if __name__ == "__main__":
    sys.exit(main())
