"""Zero-egress OCR (`ingest/ocr.py`): synthetic-render training data, the
CTC recognizer, the host text-line detector, and the LocalOCRAnnotator →
keyword-search end-to-end loop (VERDICT r3 item #2 — the text half of the
reference's I3 annotator, `Backend/JSON_sample_DOC.py:29-57`).
"""

import numpy as np
import pytest

from evr_tpu.ingest import ocr


def _frame_with_text(
    text: str, size=(640, 360), pos=(80, 300), font_size=30, fg=255, bg=30
) -> np.ndarray:
    from PIL import Image, ImageDraw, ImageFont

    img = Image.new("L", size, bg)
    font = ImageFont.truetype(ocr.FONT_PATHS[0], font_size)
    ImageDraw.Draw(img).text(pos, text, fill=fg, font=font)
    return np.asarray(img, np.uint8)


def test_label_roundtrip_and_charset():
    assert ocr.decode_ids(ocr.encode_label("fire 123")) == "fire 123"
    assert ocr.decode_ids(ocr.encode_label("Cảnh SÁT đêm")) == "cảnh sát đêm"
    # out-of-charset chars drop instead of crashing
    assert ocr.decode_ids(ocr.encode_label("a☃b")) == "ab"
    assert len(set(ocr.CHARSET)) == len(ocr.CHARSET)  # no duplicate classes


def test_render_and_dataset_shapes():
    imgs, labels, pads, texts = ocr.make_dataset(4, seed=3)
    assert imgs.shape == (4, ocr.IMG_H, ocr.IMG_W, 1)
    assert labels.shape == pads.shape == (4, ocr.MAX_LABEL)
    for t, lab, pad in zip(texts, labels, pads):
        n = int((pad == 0).sum())
        assert ocr.decode_ids(lab[:n]) == t
    # standardized crops: ~zero mean
    assert abs(float(imgs.mean())) < 0.1
    # determinism
    imgs2, *_ = ocr.make_dataset(4, seed=3)
    np.testing.assert_array_equal(imgs, imgs2)


def test_ctc_greedy_decode_collapse_and_confidence():
    # logits favouring [blank, a, a, blank, b] → "ab"
    T, C = 5, ocr.N_CLASSES
    a, b = ocr.encode_label("a")[0], ocr.encode_label("b")[0]
    logits = np.full((1, T, C), -10.0, np.float32)
    for t, cls in enumerate([ocr.BLANK_ID, a, a, ocr.BLANK_ID, b]):
        logits[0, t, cls] = 10.0
    texts, confs = ocr.ctc_greedy_decode(logits)
    assert texts == ["ab"]
    assert confs[0] > 0.9
    # all-blank → empty text, zero confidence
    blank = np.full((1, T, C), -10.0, np.float32)
    blank[:, :, ocr.BLANK_ID] = 10.0
    texts, confs = ocr.ctc_greedy_decode(blank)
    assert texts == [""] and confs[0] == 0.0


def test_detector_finds_rendered_line_and_ignores_blank():
    frame = _frame_with_text("breaking news tonight")
    boxes = ocr.detect_text_regions(frame)
    assert boxes, "detector missed an obvious overlay line"
    # the top candidate overlaps the drawn text band (y≈300..340)
    x, y, w, h = boxes[0]
    assert y < 345 and y + h > 295
    assert w > h  # line-shaped
    # flat frame → nothing
    assert ocr.detect_text_regions(np.full((360, 640), 128, np.uint8)) == []
    # dark-on-bright polarity also detected (gradients are polarity-free)
    inv = _frame_with_text("breaking news tonight", fg=20, bg=220)
    assert ocr.detect_text_regions(inv)


def test_training_reduces_ctc_loss():
    """A short CPU run must show clear optimisation progress (full
    convergence is the committed checkpoint's job, gated below)."""
    import jax

    params0 = ocr.init_ocr_params(jax.random.PRNGKey(0))
    params, metrics = ocr.train_ocr(
        steps=40, batch=16, dataset_size=64, seed=0, params=params0
    )
    # initial CTC loss at random init is ~93-100; 40 steps must cut it
    # (measured: ~78 at 40 steps on CPU, 59 at 100, 14.5 at 200 on chip)
    assert metrics["loss"] < 85.0
    # params actually moved
    assert not np.allclose(
        np.asarray(params["out_w"]), np.asarray(params0["out_w"])
    )


needs_ckpt = pytest.mark.skipif(
    not ocr.DEFAULT_CHECKPOINT.exists(),
    reason="committed OCR checkpoint absent (train with tools/train_ocr)",
)


@needs_ckpt
def test_committed_checkpoint_reads_fresh_renders():
    params = ocr.load_checkpoint()
    acc = ocr.eval_ocr(params, n=64, seed=20260820)
    assert acc >= 0.7, f"checkpoint held-out exact-match accuracy {acc}"


@needs_ckpt
def test_annotator_schema_on_seeded_frame(tmp_path):
    from PIL import Image

    frame = _frame_with_text("fire on the street", font_size=34)
    path = tmp_path / "100.jpg"
    Image.fromarray(frame).save(path, quality=95)
    ann = ocr.LocalOCRAnnotator()
    out = ann(path)
    assert set(out) == {"text_detections", "object_detections"}
    dets = out["text_detections"]
    assert dets, "no text detections on a seeded frame"
    joined = " ".join(d["label"] for d in dets)
    assert "fire" in joined
    for d in dets:
        assert set(d) == {"label", "bounding_box", "confidence"}
        assert len(d["bounding_box"]) == 4
        assert all(0.0 <= v <= 1.0 for v in d["bounding_box"])
        assert 0.0 <= d["confidence"] <= 1.0


@needs_ckpt
def test_reference_fixture_frames_yield_text(reference_fixtures):
    """The VERDICT r3 'missing #1' gate: a fresh zero-egress ingest of the
    reference's own fixture frames must produce non-empty text_detections.
    The Violence fixture carries a stable watermark + hotline overlay; the
    recognizer's read of it must also be CONSISTENT across frames (same
    dominant token), or it would be noise rather than signal."""
    frames_dir = reference_fixtures / "static" / "processed_frames" / "Violence"
    if not frames_dir.exists():
        pytest.skip("Violence fixture frames not present")
    paths = sorted(frames_dir.glob("*.jpg"))[:12]
    ann = ocr.LocalOCRAnnotator()
    outs = ann.annotate_batch(paths)
    with_text = [o for o in outs if o["text_detections"]]
    assert len(with_text) >= len(paths) // 2, "fixture frames read as empty"
    from collections import Counter

    tokens = Counter(
        d["label"] for o in with_text for d in o["text_detections"]
    )
    # the watermark line recurs: at least one token seen on >= 3 frames
    assert tokens.most_common(1)[0][1] >= 3, tokens


@needs_ckpt
def test_keyword_search_finds_ocr_seeded_frames(tmp_path):
    """The VERDICT done-gate: fresh zero-egress ingest → non-empty
    text_detections → keyword_only and text_keyword find the seeded
    frames end-to-end."""
    from PIL import Image

    from evr_tpu.index import FrameIndex
    from evr_tpu.ingest.annotate import annotate_folder
    from evr_tpu.query import MetadataStore, QueryEngine

    from tests.test_query import FakeEngine

    frames = tmp_path / "frames"
    frames.mkdir()
    words = {0: "police arrive", 40: "quiet morning", 80: "fire warning"}
    rng = np.random.default_rng(0)
    for idx, text in words.items():
        # smooth scene-like background (blurred noise ≈ camera content,
        # unlike iid per-pixel noise which no edge detector survives)
        import cv2

        base = cv2.GaussianBlur(
            rng.integers(10, 90, (360, 640)).astype(np.uint8), (31, 31), 0
        )
        frame = np.maximum(base, _frame_with_text(text, font_size=36))
        Image.fromarray(frame).save(frames / f"{idx}.jpg", quality=95)

    records = annotate_folder(
        frames, "video.mp4", annotator=ocr.LocalOCRAnnotator()
    )
    assert len(records) == 3
    non_empty = [
        r for r in records if r["text_detections"]["detections"]
    ]
    assert len(non_empty) == 3, "fresh ingest left text_detections empty"

    store = MetadataStore()
    store.add_video("vid", records, fps=25.0)
    fake = FakeEngine(dim=8)
    fake.register("fire", 2)
    emb = np.zeros((3, 8), np.float32)
    emb[2, 2] = 1.0  # frame 80 ("fire warning") along the "fire" direction
    emb[0, 1] = emb[1, 3] = 1.0
    index = FrameIndex(embed_dim=8, pad_multiple=8)
    index.add_video("vid", emb, [f"{i}.jpg" for i in sorted(words)])
    engine = QueryEngine(fake, index, store)

    # keyword_only: OCR text is the only match source
    hits = engine.query_keyword("police", adaptive_threshold=0.3, top_k=5)
    assert [h["id"] for h in hits] == ["event-0"]
    hits = engine.query_keyword("fire", adaptive_threshold=0.3, top_k=5)
    assert [h["id"] for h in hits] == ["event-80"]
    # text_keyword: CLIP direction AND the OCR keyword must both hit
    hits = engine.query_text_keyword(
        "fire", adaptive_threshold=0.5, top_k=5, keyword="fire",
        text_confidence=0.3,
    )
    assert [h["id"] for h in hits] == ["event-80"]
    assert hits[0]["detection_type"] == "text+clip"
