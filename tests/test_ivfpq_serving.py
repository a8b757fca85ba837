"""The production two-tier ANN path end-to-end through the HTTP API
(VERDICT r4 #9): a ServingContext booted with ``search_impl="ivfpq"`` +
``ivfpq_host_store=True`` — device holds ONLY the PQ codes, re-rank rows
live in host DRAM as int8 — must serve /api/search with the always-on
re-rank, and FrameIndex must reproduce the exact top-k under a full probe.
"""

import json

import numpy as np
import pytest

werkzeug = pytest.importorskip("werkzeug")
from werkzeug.test import Client

from evr_tpu.config import DataRootConfig
from evr_tpu.index import EmbeddingEngine, FrameIndex
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
from evr_tpu.serving import ServingContext, create_app


def _corpus(n=600, d=32, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    return emb


def test_frame_index_host_store_exact_at_full_probe():
    emb = _corpus()
    fi = FrameIndex(
        embed_dim=32, search_impl="ivfpq", ivf_clusters=8, ivf_nprobe=8,
        ivfpq_host_store=True,
    )
    fi.add_video("v", emb)
    q = emb[[5, 99, 301]] + 0.01 * np.random.default_rng(1).normal(size=(3, 32))
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    s, r = fi.search_raw(q, 5)
    er = np.argsort(-(q @ emb.T), axis=1)[:, :5]
    # int8 host re-rank can flip near-ties; top-1 identity + strong overlap
    np.testing.assert_array_equal(r[:, 0], er[:, 0])
    overlap = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(r, er)])
    assert overlap >= 0.8
    # the two-tier shape is real: no fp32 originals resident, int8 rows are
    assert fi._ivf._originals is None
    assert fi._ivf._originals_int8 is not None
    assert fi._ivf._originals_int8.dtype == np.int8


def test_host_store_appends_incrementally():
    """Uploads extend the int8 host store in lockstep with the appended
    global ids (round 5 — previously every upload forced a full rebuild
    of the two-tier index)."""
    emb = _corpus(n=300)
    fi = FrameIndex(
        embed_dim=32, search_impl="ivfpq", ivf_clusters=4, ivf_nprobe=4,
        ivfpq_host_store=True,
    )
    fi.add_video("a", emb[:200])
    fi.search_raw(emb[:2], 3)  # force build
    built = fi._ivf
    fi.add_video("b", emb[200:])
    assert fi._ivf is built  # incremental append, no rebuild
    assert fi._ivf._originals_int8.shape[0] == 300  # store covers the append
    # appended rows are findable and re-ranked through the extended store
    q = emb[[250, 287]]
    s, r = fi.search_raw(q, 3)
    np.testing.assert_array_equal(r[:, 0], [250, 287])  # self-query rank-1
    assert np.isfinite(s[:, 0]).all()


def test_invalid_combo_rejected():
    with pytest.raises(ValueError, match="ivfpq_host_store requires"):
        FrameIndex(embed_dim=32, search_impl="xla", ivfpq_host_store=True)


@pytest.fixture(scope="module")
def client():
    small = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    engine = EmbeddingEngine(cfg=small, batch_size=4)
    import tempfile

    root = tempfile.mkdtemp()
    ctx = ServingContext(
        DataRootConfig(root),
        engine=engine,
        search_impl="ivfpq",
        ivf_clusters=8,
        ivf_nprobe=8,
        ivfpq_host_store=True,
    )
    # synthetic corpus whose row 7 IS the query's text direction, so the
    # semantic strategy scores ~1.0 there and clears its threshold
    emb = _corpus(n=400, d=32, seed=3)
    target = np.asarray(engine.get_text_features("a red firetruck"), np.float32)
    target = target / np.linalg.norm(target)
    emb[7] = target
    ctx.index.add_video("synth", emb)
    ctx.metadata.add_video(
        "synth",
        [{"frameidx": i, "frameid": f"{i}.jpg"} for i in range(len(emb))],
    )
    import pathlib

    vid = pathlib.Path(root) / "synth.mp4"
    vid.write_bytes(b"0000")
    ctx.registry.add("synth", video_path=str(vid))
    return Client(create_app(ctx))


def test_api_search_through_two_tier_ann(client):
    resp = client.post(
        "/api/search",
        json={"query": "a red firetruck", "search_method": "text_clip",
              "top_k": 5},
    )
    assert resp.status_code == 200
    events = json.loads(resp.get_data(as_text=True))["events"]
    assert events, "two-tier ANN search returned nothing"
    # the planted frame ranks first through probe + int8 host re-rank
    top = events[0]
    assert top["id"] == "event-7"
    assert top["clip_similarity"] > 0.9
