"""AOT serving bundles (`serving/aot.py`): export → serialize → reload →
call must reproduce the live encoders exactly, at MULTIPLE batch sizes from
one artifact (symbolic batch dim), with params supplied at call time
(weights-independent bundle)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evr_tpu.models.clip import (
    CLIPConfig,
    TextConfig,
    VisionConfig,
    encode_image,
    encode_text,
    init_clip_params,
)
from evr_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD
from evr_tpu.serving.aot import export_encoders, load_bundle, save_bundle


def tiny_cfg():
    return CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=TextConfig(context_length=16, vocab_size=600, width=64, layers=2, heads=4),
    )


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    cfg = tiny_cfg()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    out = tmp_path_factory.mktemp("aot")
    save_bundle(out, cfg, export_encoders(cfg))
    return cfg, params, out


def _staged(rng, n):
    return (rng.random((n, 32, 32, 3)) * 255).astype(np.uint8)


def _tokens(rng, n):
    t = np.zeros((n, 16), np.int32)
    t[:, 0] = 1
    t[:, 1] = 599
    return t


def test_roundtrip_matches_live_encoders(bundle, rng):
    cfg, params, out = bundle
    enc = load_bundle(out)
    for n in (2, 5):  # two batch sizes through ONE exported artifact
        u8 = _staged(rng, n)
        got = enc.encode_staged(params, u8)
        x = u8.astype(np.float32) / 255.0
        x = (x - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)
        want = np.asarray(encode_image(params, cfg, jnp.asarray(x)))
        want = want / np.linalg.norm(want, axis=-1, keepdims=True)
        np.testing.assert_allclose(got, want, atol=1e-5)

        toks = _tokens(rng, n)
        got_t = enc.encode_tokens(params, toks)
        want_t = np.asarray(encode_text(params, cfg, jnp.asarray(toks)))
        want_t = want_t / np.linalg.norm(want_t, axis=-1, keepdims=True)
        np.testing.assert_allclose(got_t, want_t, atol=1e-5)


def test_bundle_is_weights_independent(bundle, rng):
    """One artifact serves a different checkpoint of the same geometry."""
    cfg, _, out = bundle
    enc = load_bundle(out)
    other = init_clip_params(jax.random.PRNGKey(7), cfg)
    got = enc.encode_tokens(other, _tokens(rng, 3))
    want = np.asarray(encode_text(other, cfg, jnp.asarray(_tokens(rng, 3))))
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


def test_manifest_and_guards(bundle, tmp_path):
    cfg, _, out = bundle
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["kind"] == "evr_tpu_aot_encoders"
    assert "tpu" in manifest["platforms"] and "cpu" in manifest["platforms"]
    assert manifest["config"]["attn_impl"] == "xla"

    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "manifest.json").write_text(json.dumps({"kind": "something_else"}))
    with pytest.raises(ValueError):
        load_bundle(bad)

    newer = tmp_path / "newer"
    newer.mkdir()
    m = dict(manifest)
    m["format_version"] = 99
    (newer / "manifest.json").write_text(json.dumps(m))
    with pytest.raises(ValueError):
        load_bundle(newer)


def test_aot_engine_end_to_end_retrieval(bundle, tmp_path, rng):
    """A host with only the bundle + weights serves retrieval: embed a frame
    folder via AotEngine, build a FrameIndex, run a text query — results
    identical to the live-model path with the same params."""
    from PIL import Image

    from evr_tpu.index import FrameIndex
    from evr_tpu.serving.aot import AotEngine

    cfg, params, out = bundle
    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(6):
        Image.fromarray(
            (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        ).save(frames / f"{i}.jpg")

    eng = AotEngine(out, params)
    assert eng.cfg.vision.image_size == cfg.vision.image_size
    emb, names = eng.embed_folder(frames)
    assert names == [f"{i}.jpg" for i in range(6)] and emb.shape == (6, 32)

    idx = FrameIndex(embed_dim=cfg.embed_dim, pad_multiple=8)
    idx.add_video("v", emb)
    q = eng.get_text_features("a red frame")
    hits = idx.search(q, top_k=3)[0]

    # live-model reference path: identical staged pixels through the live
    # jitted encoder (embed_folder would re-stage through the C++ bicubic
    # path — a different, separately-tested staging pipeline)
    from evr_tpu.index.engine import EmbeddingEngine, stage_image_fast

    live = EmbeddingEngine(cfg=cfg, params=params, batch_size=4,
                           compute_dtype=jnp.float32)
    staged = np.stack(
        [stage_image_fast(frames / n, cfg.vision.image_size) for n in names]
    )
    live_emb = live.encode_staged_images(staged, normalise=True)
    cos = (emb * live_emb).sum(-1)
    assert cos.min() >= 1 - 1e-5

    q_live = live.get_text_features("a red frame")
    idx2 = FrameIndex(embed_dim=cfg.embed_dim, pad_multiple=8)
    idx2.add_video("v", live_emb)
    hits_live = idx2.search(q_live, top_k=3)[0]
    assert [h.frame_name for h in hits] == [h.frame_name for h in hits_live]

    # text cache hits return the same vector
    np.testing.assert_array_equal(
        eng.get_text_features("a red frame"), eng.get_text_features("a red frame")
    )


def test_retrieve_cli_aot_bundle(bundle, tmp_path, rng, capsys):
    """`tools/retrieve --aot-bundle` runs the full retrieval flow from a
    bundle: geometry from the manifest, no live model code."""
    from PIL import Image

    from evr_tpu.tools.retrieve import main as retrieve_main

    cfg, params, out = bundle
    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(5):
        Image.fromarray(
            (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        ).save(frames / f"{i}.jpg")
    result = tmp_path / "res.json"
    retrieve_main([
        "--frames-dir", str(frames),
        "--queries", "a frame", "another frame",
        "--aot-bundle", str(out),
        "--top-k", "3",
        "--output", str(result),
    ])
    data = json.loads(result.read_text())
    assert set(data) == {"a frame", "another frame"}
    assert len(data["a frame"]) == 3
    assert all("similarity" in r and "frame" in r for r in data["a frame"])
