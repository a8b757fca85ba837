"""Speech-transcript search (beyond-reference modality): MetadataStore
transcript matching, the speech_only/text_speech strategies, serving boot
sidecar loading, Whisper segment emission, and the transcribe CLI artifact
mode.

The reference probed Whisper subtitles (`content/file_test_prob/
test_subtitles.py`) but never indexed them; here transcripts are a
first-class time-anchored match source.
"""

import json
import wave

import numpy as np
import pytest

from evr_tpu.index import FrameIndex
from evr_tpu.query import MetadataStore, QueryEngine
from evr_tpu.query.metadata import SPEECH_CONF

from tests.test_query import FakeEngine, _frame


SEGMENTS = [
    {"start": 0.0, "end": 2.0, "text": "two men start fighting loudly"},
    {"start": 2.0, "end": 4.0, "text": "cảnh sát arrives at the scene"},
    {"start": 6.0, "end": 8.0, "text": "quiet street at night"},
]


def _store_with_transcript(fps=25.0):
    store = MetadataStore()
    # frames at t = 0.4s, 1.6s, 2.8s, 7.2s
    store.add_video(
        "testvid",
        [_frame(10), _frame(40), _frame(70), _frame(180)],
        fps=fps,
    )
    store.add_transcript("testvid", SEGMENTS)
    return store


def test_speech_matches_accent_insensitive():
    store = _store_with_transcript()
    assert store.has_transcript("testvid")
    hits = store.speech_matches("testvid", "fighting")
    assert [h[2] for h in hits] == ["two men start fighting loudly"]
    # accent-folded needle matches the accented transcript text
    hits = store.speech_matches("testvid", "canh sat")
    assert [h[2] for h in hits] == ["cảnh sát arrives at the scene"]
    assert store.speech_matches("testvid", "explosion") == []
    assert store.speech_matches("novideo", "fighting") == []


def test_speech_best_match_time_coverage():
    store = _store_with_transcript()
    f_early = store.frame_by_idx("testvid", 10)   # t=0.4 → segment 1
    f_mid = store.frame_by_idx("testvid", 70)     # t=2.8 → segment 2
    f_late = store.frame_by_idx("testvid", 180)   # t=7.2 → segment 3
    conf, text = store.speech_best_match("testvid", f_early, "fighting")
    assert conf == SPEECH_CONF and "fighting" in text
    # keyword in a segment that does NOT cover the frame's time → no match
    conf, _ = store.speech_best_match("testvid", f_mid, "fighting")
    assert conf == 0.0
    conf, text = store.speech_best_match("testvid", f_late, "quiet")
    assert conf == SPEECH_CONF and text == "quiet street at night"


def test_speech_frames_merge_and_limit():
    store = _store_with_transcript()
    got = store.speech_frames("testvid", "fighting")
    assert [(f.frameidx, t) for f, t in got] == [
        (10, "two men start fighting loudly"),
        (40, "two men start fighting loudly"),
    ]
    assert len(store.speech_frames("testvid", "fighting", limit=1)) == 1
    # frames in the 4..6s gap match nothing
    assert store.speech_frames("testvid", "nonexistent") == []


def test_unordered_frames_still_merge():
    store = MetadataStore()
    store.add_video("v", [_frame(70), _frame(10), _frame(40)], fps=25.0)
    store.add_transcript("v", SEGMENTS)
    got = store.speech_frames("v", "fighting")
    assert sorted(f.frameidx for f, _ in got) == [10, 40]


def test_transcript_payload_dict_and_empty_segments():
    store = MetadataStore()
    store.add_video("v", [_frame(10)], fps=25.0)
    store.add_transcript("v", [{"start": 0, "end": 1, "text": "  "}])
    assert not store.has_transcript("v")


@pytest.fixture()
def speech_qe():
    dim = 8
    fake = FakeEngine(dim)
    fake.register("fight", 1)
    emb = np.zeros((4, dim), np.float32)
    emb[0, 1] = 1.0   # 10.jpg aligned with "fight"
    emb[1, 1] = 0.6   # 40.jpg at cos=0.6 to "fight" (rows are L2-normalised)
    emb[1, 2] = 0.8
    emb[2, 2] = 1.0   # 70.jpg
    emb[3, 3] = 1.0   # 180.jpg
    idx = FrameIndex(embed_dim=dim, pad_multiple=8)
    idx.add_video("testvid", emb, ["10.jpg", "40.jpg", "70.jpg", "180.jpg"])
    store = _store_with_transcript()
    return QueryEngine(fake, idx, store)


def test_query_speech_only(speech_qe):
    results = speech_qe.query_speech("fighting", top_k=10)
    assert {r["id"] for r in results} == {"event-10", "event-40"}
    for r in results:
        assert r["detection_type"] == "speech"
        assert r["speech_confidence"] == SPEECH_CONF
        assert r["confidence"] == SPEECH_CONF
        assert "fighting" in r["speech_text"]
    assert speech_qe.query_speech("explosion", top_k=10) == []


def test_query_text_speech_fusion(speech_qe):
    # CLIP "fight" candidates ∩ frames whose speech mentions "fighting":
    # only 10.jpg and 40.jpg are inside the matching segment
    results = speech_qe.query_text_speech(
        "fight", adaptive_threshold=0.2, top_k=10, keyword="fighting"
    )
    assert [r["id"] for r in results] == ["event-10", "event-40"]
    top = results[0]
    assert top["detection_type"] == "speech+clip"
    assert top["clip_similarity"] == pytest.approx(1.0, abs=1e-5)
    # fusion = max(clip, speech): 40.jpg's clip score (0.6) < SPEECH_CONF
    assert top["confidence"] == pytest.approx(1.0, abs=1e-5)
    assert results[1]["confidence"] == pytest.approx(SPEECH_CONF)
    assert results[1]["clip_similarity"] == pytest.approx(0.6, abs=1e-5)
    # threshold gates the weaker CLIP hit
    results = speech_qe.query_text_speech(
        "fight", adaptive_threshold=0.9, top_k=10, keyword="fighting"
    )
    assert [r["id"] for r in results] == ["event-10"]


def test_dispatch_table_has_speech_methods(speech_qe):
    got = speech_qe.search("speech_only", keyword="fighting", top_k=5)
    assert got and all(r["detection_type"] == "speech" for r in got)
    got = speech_qe.search(
        "text_speech", query="fight", adaptive_threshold=0.2, top_k=5,
        keyword="fighting",
    )
    assert got and got[0]["detection_type"] == "speech+clip"


# -- whisper segment emission ------------------------------------------------

def test_whisper_transcribe_segments_windows():
    jax = pytest.importorskip("jax")
    from evr_tpu.models.whisper import (
        WHISPER_SIZES,
        WhisperASR,
        init_whisper_params,
    )

    cfg = WHISPER_SIZES["tiny-test"]
    params = init_whisper_params(jax.random.PRNGKey(3), cfg)
    asr = WhisperASR(params, cfg, prompt_ids=[cfg.sot_id], max_len=6)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(int(2.5 * cfg.n_samples)).astype(np.float32)
    asr.detokenize = lambda ids: "spoken words"
    segs = asr.transcribe_segments(audio)
    assert len(segs) == 3
    assert segs[0] == {"start": 0.0, "end": float(cfg.chunk_length),
                       "text": "spoken words"}
    assert segs[1]["start"] == float(cfg.chunk_length)
    # last window is clipped to the true duration
    assert segs[2]["end"] == pytest.approx(2.5 * cfg.chunk_length)
    # empty-text windows are dropped
    asr.detokenize = lambda ids: ""
    assert asr.transcribe_segments(audio) == []
    # without a detokenizer the ids become searchable strings
    asr.detokenize = None
    segs = asr.transcribe_segments(audio)
    assert all(isinstance(s["text"], str) for s in segs)


# -- artifact build + CLI ------------------------------------------------------

def _write_wav(path, seconds, rate=16000):
    x = (np.sin(np.linspace(0, 440 * 2 * np.pi * seconds, int(rate * seconds)))
         * 0.3 * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())


def test_build_video_transcript_artifact(tmp_path):
    wav = tmp_path / "vid.wav"
    _write_wav(wav, 1.0)

    def fake_transcriber(audio):
        assert audio.dtype == np.float32 and audio.ndim == 1
        return [
            {"start": 0.0, "end": 0.5, "text": "hello there"},
            {"start": 0.5, "end": 1.0, "text": "   "},  # dropped
        ]

    out = tmp_path / "meta" / "vid_transcript.json"
    from evr_tpu.ingest.transcripts import build_video_transcript, load_transcript

    payload = build_video_transcript(wav, "vid", fake_transcriber, out)
    assert payload["video"] == "vid"
    assert payload["segments"] == [
        {"start": 0.0, "end": 0.5, "text": "hello there"}
    ]
    assert load_transcript(out) == payload["segments"]


def test_transcribe_cli_segments_out(tmp_path):
    pytest.importorskip("jax")
    import evr_tpu.tools.transcribe as cli

    wav = tmp_path / "myvideo.wav"
    # tiny-test cfg: 3 s windows at 16 kHz → 1.5 windows → 2 segments max
    _write_wav(wav, 4.0)
    out_dir = tmp_path / "meta"
    results = cli.main([
        str(wav), "--size", "tiny-test", "--random-init",
        "--max-len", "6", "--segments-out", str(out_dir),
    ])
    art = out_dir / "myvideo_transcript.json"
    assert art.exists()
    payload = json.loads(art.read_text())
    assert payload["video"] == "myvideo"
    for seg in payload["segments"]:
        assert set(seg) == {"start", "end", "text"}
        assert seg["end"] <= 4.0 + 1e-6
    assert results[str(wav)] == payload


# -- serving boot + route ------------------------------------------------------

def test_serving_speech_search_e2e(tmp_path):
    cv2 = pytest.importorskip("cv2")
    pytest.importorskip("werkzeug")
    from werkzeug.test import Client

    from evr_tpu.config import DataRootConfig
    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
    from evr_tpu.serving import ServingContext, create_app
    from tests.test_serving import _make_video, get_json

    video_path = tmp_path / "clip1.mp4"
    _make_video(video_path)
    small = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    engine = EmbeddingEngine(cfg=small, batch_size=4)
    ctx = ServingContext(DataRootConfig(tmp_path / "data"), engine=engine)
    ctx.ingest(video_path)

    # drop the transcript sidecar next to the metadata file, then re-boot a
    # fresh context (the loading path a deployment actually exercises)
    entry = ctx.registry.get("clip1")
    meta_path = ctx.resolve_path(entry["metadata_file"])
    sidecar = meta_path.parent / "clip1_transcript.json"
    sidecar.write_text(json.dumps({
        "video": "clip1",
        "segments": [{"start": 0.0, "end": 1.2, "text": "a red screen glows"}],
    }))

    engine2 = EmbeddingEngine(cfg=small, batch_size=4)
    ctx2 = ServingContext(DataRootConfig(tmp_path / "data"), engine=engine2)
    assert ctx2.boot() == ["clip1"]
    assert ctx2.metadata.has_transcript("clip1")
    client = Client(create_app(ctx2))

    resp = client.post("/api/search", json={
        "type": "text", "query": "red", "search_method": "speech_only",
        "keyword": "red screen", "top_k": 10,
    })
    assert resp.status_code == 200
    events = get_json(resp)["events"]
    assert events, "speech_only returned no events"
    for e in events:
        assert e["detection_type"] == "speech"
        assert e["speech_text"] == "a red screen glows"
        assert e["timestamp"] < 1.2 + 1e-6

    resp = client.post("/api/search", json={
        "type": "text", "query": "a red screen", "search_method": "text_speech",
        "keyword": "red screen", "adaptive_threshold": -1.0, "top_k": 10,
    })
    assert resp.status_code == 200
    fused = get_json(resp)["events"]
    assert fused and fused[0]["detection_type"] == "speech+clip"
    assert np.isfinite(fused[0]["clip_similarity"])
    assert fused[0]["speech_text"] == "a red screen glows"
