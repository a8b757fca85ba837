"""Machine captions in frame records: the TPU PrefixCaptioner feeds
``metadata.caption``, which object search scores as the caption source
(weight 0.65 — `query_strategies.py:219-227`)."""

import jax
import numpy as np
import pytest

from evr_tpu.data_prep.captioning import PrefixCaptioner
from evr_tpu.index.engine import EmbeddingEngine
from evr_tpu.ingest.annotate import annotate_folder, build_frame_record
from evr_tpu.models.captioner import CaptionerConfig, init_captioner_params
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, init_clip_params
from evr_tpu.query.metadata import MetadataStore

CLIP_CFG = CLIPConfig(
    embed_dim=16,
    vision=VisionConfig(32, 8, 32, 1, 2),
    text=TextConfig(context_length=16, vocab_size=64, width=32, layers=1, heads=2),
)

CAP_CFG = CaptionerConfig(
    vocab_size=64, sot_id=62, eot_id=63, width=32, layers=1, heads=2,
    image_dim=16, prefix_len=2, max_new_tokens=4,
)


@pytest.fixture(scope="module")
def frames(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("cap_frames")
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(d / f"{i * 30}.jpg")
    return d


def test_prefix_captioner_batch(frames):
    engine = EmbeddingEngine(
        cfg=CLIP_CFG,
        params=init_clip_params(jax.random.PRNGKey(0), CLIP_CFG),
        batch_size=4,
    )
    cap = PrefixCaptioner(
        engine, init_captioner_params(jax.random.PRNGKey(1), CAP_CFG), CAP_CFG
    )
    paths = sorted(str(p) for p in frames.iterdir())
    texts = cap.caption_batch(paths)
    assert len(texts) == 3 and all(isinstance(t, str) for t in texts)
    assert cap(paths[0]) == texts[0]  # protocol __call__ == batch of one


def test_annotate_folder_with_captioner(frames):
    class StubCaptioner:
        def caption_batch(self, paths):
            return [f"a violent scene {i}" for i in range(len(paths))]

    records = annotate_folder(frames, "vid.mp4", captioner=StubCaptioner())
    assert len(records) == 3
    for rec in records:
        assert rec["metadata"]["caption"].startswith("a violent scene")

    # caption source reaches object search at weight 0.65
    store = MetadataStore()
    store.add_video("vid", records)
    for frame in store.frames("vid"):
        found, conf, _ = store.object_best_match(frame, "violent")
        assert found and abs(conf - 0.65) < 1e-9


def test_build_frame_record_caption_optional(frames):
    p = sorted(frames.iterdir())[0]
    rec = build_frame_record(p, "vid.mp4")
    assert "caption" not in rec["metadata"]
    rec = build_frame_record(p, "vid.mp4", caption="hello world")
    assert rec["metadata"]["caption"] == "hello world"


def test_annotate_folder_captioner_batch_failure_degrades(frames):
    calls = []

    class FlakyCaptioner:
        def caption_batch(self, paths):
            raise IOError("cannot decode image")

        def __call__(self, path, category=None):
            calls.append(path)
            if str(path).endswith("30.jpg"):
                raise IOError("bad frame")
            return "fallback caption"

    records = annotate_folder(frames, "vid.mp4", captioner=FlakyCaptioner())
    assert len(records) == 3  # every frame still annotated
    caps = [r["metadata"].get("caption") for r in records]
    assert caps.count("fallback caption") == 2  # bad frame skipped, no abort
    assert len(calls) == 3
