"""Best-frame selection + caption-mapping builder (I5 parity) and the
caption-JSON canonicalizer."""

import json

import numpy as np
import pytest

from evr_tpu.data_prep.splits import canonicalize_caption_json


class StubEngine:
    """Engine stub with controllable frame/text embeddings."""

    def __init__(self, frame_vecs, name_order, text_map):
        self.frame_vecs = frame_vecs
        self.name_order = name_order
        self.text_map = text_map

    def embed_folder(self, folder, normalise=True):
        return self.frame_vecs, self.name_order

    def encode_texts(self, texts, normalise=True):
        return np.stack([self.text_map[t] for t in texts])


def _unit(i, d=4):
    v = np.zeros(d, np.float32)
    v[i] = 1.0
    return v


def test_select_best_frames():
    from evr_tpu.ingest.best_frame import select_best_frames

    frames = np.stack([_unit(0), _unit(1), _unit(2)])
    engine = StubEngine(frames, ["a.jpg", "b.jpg", "c.jpg"], {
        "caption one": _unit(1),
        "caption two": _unit(2),
    })
    rows = select_best_frames(engine, "ignored", ["caption one", "caption two"])
    assert [r["frame"] for r in rows] == ["b.jpg", "c.jpg"]
    assert all(r["similarity"] == pytest.approx(1.0) for r in rows)


def test_build_mapping(tmp_path):
    from evr_tpu.ingest.best_frame import build_frame_caption_mapping

    frames = np.stack([_unit(0), _unit(3)])
    engine = StubEngine(frames, ["10.jpg", "20.jpg"], {"x": _unit(3)})
    out = tmp_path / "map.json"
    mapping = build_frame_caption_mapping(engine, {"clipA": ("d", ["x"])}, out)
    assert mapping == json.loads(out.read_text())
    assert list(mapping) == ["clipA/20.jpg"]


def test_canonicalize_caption_json(tmp_path):
    data = {
        "v/frame_30.jpg": {"caption": "c", "category": "Violence"},
        "n/frame_2.jpg": {"caption": "a", "category": "NonViolence"},
        "v/frame_4.jpg": {"caption": "b", "category": "Violence"},
    }
    p = tmp_path / "caps.json"
    p.write_text(json.dumps(data))
    n = canonicalize_caption_json(p)
    assert n == 3
    ordered = list(json.loads(p.read_text()))
    assert ordered == ["n/frame_2.jpg", "v/frame_4.jpg", "v/frame_30.jpg"]
