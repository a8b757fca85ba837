"""SigLIP towers vs HuggingFace ``SiglipModel`` at random init (fp32 CPU):
the second model family's parity gate, mirroring the CLIP HF-parity
strategy. Also pins the architectural deltas (no CLS, MAP head, last-token
pooling, logit bias)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evr_tpu.models.siglip import (
    SiglipConfig,
    SiglipTextConfig,
    SiglipVisionConfig,
    encode_image,
    encode_text,
    from_hf_siglip_state_dict,
    init_siglip_params,
    siglip_config_from_hf,
    siglip_forward,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_hf_config():
    from transformers import SiglipConfig as HFConfig

    return HFConfig(
        vision_config={
            "hidden_size": 64, "intermediate_size": 112,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 32, "patch_size": 16,
        },
        text_config={
            "hidden_size": 64, "intermediate_size": 112,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "max_position_embeddings": 12, "vocab_size": 120,
        },
    )


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import SiglipModel

    torch.manual_seed(0)
    hf = SiglipModel(_tiny_hf_config()).eval()
    cfg = siglip_config_from_hf(hf.config)
    params = from_hf_siglip_state_dict(hf.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)
    return hf, cfg, params


def test_config_mapping(tiny_pair):
    hf, cfg, _ = tiny_pair
    assert cfg.vision.width == 64 and cfg.vision.mlp_dim == 112
    assert cfg.text.context_length == 12 and cfg.text.vocab_size == 120
    assert cfg.embed_dim == 64  # no projection: features at tower width


def test_image_tower_parity(tiny_pair):
    hf, cfg, params = tiny_pair
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(encode_image(params, cfg, jnp.asarray(pixels)))
    with torch.no_grad():
        theirs = hf.get_image_features(
            pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


def test_text_tower_parity(tiny_pair):
    hf, cfg, params = tiny_pair
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 120, size=(4, 12)).astype(np.int32)
    ours = np.asarray(encode_text(params, cfg, jnp.asarray(tokens)))
    with torch.no_grad():
        theirs = hf.get_text_features(
            input_ids=torch.tensor(tokens.astype(np.int64))
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


def test_joint_forward_logits_parity(tiny_pair):
    hf, cfg, params = tiny_pair
    rng = np.random.default_rng(2)
    pixels = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    tokens = rng.integers(0, 120, size=(2, 12)).astype(np.int32)
    out = siglip_forward(params, cfg, jnp.asarray(pixels), jnp.asarray(tokens))
    with torch.no_grad():
        hf_out = hf(
            pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2)),
            input_ids=torch.tensor(tokens.astype(np.int64)),
        )
    np.testing.assert_allclose(
        np.asarray(out["logits_per_image"]),
        hf_out.logits_per_image.numpy(),
        rtol=2e-4, atol=2e-4,
    )
    # unit-norm features
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0,
        rtol=1e-5,
    )


def test_random_init_runs_and_shapes():
    cfg = SiglipConfig(
        vision=SiglipVisionConfig(image_size=32, patch_size=16, width=32,
                                  layers=1, heads=2, mlp_dim=64),
        text=SiglipTextConfig(context_length=8, vocab_size=50, width=32,
                              layers=1, heads=2, mlp_dim=64),
    )
    params = init_siglip_params(jax.random.PRNGKey(0), cfg)
    img = encode_image(params, cfg, jnp.zeros((2, 32, 32, 3)))
    txt = encode_text(params, cfg, jnp.zeros((2, 8), jnp.int32))
    assert img.shape == (2, 32) and txt.shape == (2, 32)
    assert float(params["logit_bias"]) == -10.0


def test_production_geometry_parity():
    """Full siglip-base-patch16-224 geometry (768w/12L both towers) — the
    shape actually served; guards head-count math, MAP-head at scale,
    64-ctx last-token pooling."""
    from transformers import SiglipConfig as HFConfig, SiglipModel

    torch.manual_seed(1)
    hf = SiglipModel(HFConfig()).eval()
    cfg = siglip_config_from_hf(hf.config)
    params = jax.tree.map(
        jnp.asarray, from_hf_siglip_state_dict(hf.state_dict(), cfg)
    )
    rng = np.random.default_rng(3)
    pixels = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    tokens = rng.integers(0, 32000, size=(2, 64)).astype(np.int32)
    ours_i = np.asarray(encode_image(params, cfg, jnp.asarray(pixels)))
    ours_t = np.asarray(encode_text(params, cfg, jnp.asarray(tokens)))
    with torch.no_grad():
        hf_i = hf.get_image_features(
            pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2))
        ).numpy()
        hf_t = hf.get_text_features(
            input_ids=torch.tensor(tokens.astype(np.int64))
        ).numpy()
    for ours, theirs in [(ours_i, hf_i), (ours_t, hf_t)]:
        cos = (ours * theirs).sum(-1) / (
            np.linalg.norm(ours, axis=-1) * np.linalg.norm(theirs, axis=-1)
        )
        assert cos.min() > 1 - 1e-6, cos


# -- SiglipEngine serving adapter ------------------------------------------


def _tiny_engine(tokenize=True):
    from evr_tpu.index.siglip_engine import SiglipEngine

    cfg = SiglipConfig(
        vision=SiglipVisionConfig(image_size=32, patch_size=16, width=32,
                                  layers=1, heads=2, mlp_dim=64),
        text=SiglipTextConfig(context_length=8, vocab_size=50, width=32,
                              layers=1, heads=2, mlp_dim=64),
    )

    def stub_tokenize(texts):
        out = np.zeros((len(texts), 8), np.int32)
        for i, t in enumerate(texts):
            ids = [(hash(w) % 48) + 1 for w in t.split()][:8]
            out[i, : len(ids)] = ids
        return out

    return SiglipEngine(
        cfg=cfg, tokenize_fn=stub_tokenize if tokenize else None,
        batch_size=4,
    )


def test_siglip_engine_encodes_images_and_text():
    eng = _tiny_engine()
    rng = np.random.default_rng(0)
    staged = (rng.random((6, 32, 32, 3)) * 255).astype(np.uint8)  # odd batch
    feats = eng.encode_staged_images(staged)
    assert feats.shape == (6, 32)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-5)
    t = eng.get_text_features("a dog running")
    assert t.shape == (32,)
    # cache hit returns the identical array
    assert eng.get_text_features("a dog running") is t


def test_siglip_engine_without_tokenizer_uses_fallback():
    """No tokenize_fn → the deterministic byte-level fallback stands in
    (zero-egress drivability, VERDICT r3 #8) and announces itself."""
    eng = _tiny_engine(tokenize=False)
    assert eng.tokenizer_source == "fallback"
    t = eng.get_text_features("anything")
    assert t.shape == (32,)
    np.testing.assert_allclose(np.linalg.norm(t), 1.0, rtol=1e-5)
    # deterministic: same text → same ids → identical features
    eng2 = _tiny_engine(tokenize=False)
    np.testing.assert_array_equal(t, eng2.get_text_features("anything"))
    assert _tiny_engine(tokenize=True).tokenizer_source == "provided"
    # image path unaffected
    staged = np.zeros((2, 32, 32, 3), np.uint8)
    assert eng.encode_staged_images(staged).shape == (2, 32)


def test_siglip_engine_backs_the_serving_stack():
    """End-to-end: SiglipEngine behind ServingContext → /api/search finds
    the frame planted along the encoded query direction (two-step strategy
    dispatch; the fused searcher is CLIP-specific and must be bypassed)."""
    import json as _json
    import pathlib
    import tempfile

    from werkzeug.test import Client

    from evr_tpu.config import DataRootConfig
    from evr_tpu.serving.app import create_app
    from evr_tpu.serving.context import ServingContext

    eng = _tiny_engine()
    root = pathlib.Path(tempfile.mkdtemp())
    ctx = ServingContext(DataRootConfig(root / "data"), engine=eng)
    ctx.boot()
    qv = eng.get_text_features("a dog running")
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((20, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb[7] = qv
    ctx.index.add_video("v0", emb)
    recs = [{"frameidx": i, "frameid": f"{i}.jpg", "video": "videos/v0.mp4",
             "filepath": f"frames/{i}.jpg", "tags": [], "metadata": {},
             "text_detections": {"detections": []},
             "object_detections": {"detections": []}} for i in range(20)]
    ctx.metadata.add_video("v0", recs)
    c = Client(create_app(ctx))
    r = c.post("/api/search", json={
        "query": "a dog running", "search_method": "text_clip", "top_k": 3,
    })
    assert r.status_code == 200
    events = _json.loads(r.get_data(as_text=True))["events"]
    assert events and events[0]["id"] == "event-7"


def test_siglip_engine_image_search_and_models_route():
    """search_type='image' takes the two-step fallback (the fused
    ImageSearcher is CLIP-specific) and /api/models serves model_name."""
    import base64
    import io
    import json as _json
    import pathlib
    import tempfile

    import cv2
    from werkzeug.test import Client

    from evr_tpu.config import DataRootConfig
    from evr_tpu.index.engine import stage_array_fast
    from evr_tpu.serving.app import create_app
    from evr_tpu.serving.context import ServingContext

    eng = _tiny_engine()
    root = pathlib.Path(tempfile.mkdtemp())
    ctx = ServingContext(DataRootConfig(root / "data"), engine=eng)
    ctx.boot()
    rng = np.random.default_rng(2)
    imgs = (rng.random((5, 32, 32, 3)) * 255).astype(np.uint8)
    staged = np.stack([stage_array_fast(i, 32) for i in imgs])
    feats = eng.encode_staged_images(staged)
    ctx.index.add_video("v0", feats)
    recs = [{"frameidx": i, "frameid": f"{i}.jpg", "video": "videos/v0.mp4",
             "filepath": f"frames/{i}.jpg", "tags": [], "metadata": {},
             "text_detections": {"detections": []},
             "object_detections": {"detections": []}} for i in range(5)]
    ctx.metadata.add_video("v0", recs)
    c = Client(create_app(ctx))

    ok, buf = cv2.imencode(".png", imgs[3][:, :, ::-1])  # png: lossless
    assert ok
    b64 = base64.b64encode(buf.tobytes()).decode()
    r = c.post("/api/search", json={
        "search_type": "image",
        "image_url": f"data:image/png;base64,{b64}",
        "top_k": 1, "adaptive_threshold": -1.0,
    })
    assert r.status_code == 200
    events = _json.loads(r.get_data(as_text=True))["events"]
    assert events and events[0]["id"] == "event-3"

    m = c.get("/api/models")
    assert m.status_code == 200


def test_siglip_engine_stager_and_embed_folder(tmp_path):
    """SigLIP staging squashes to SxS (no center crop — HF parity) and
    embed_folder backs the upload->ingest contract (sorted names, skip
    unreadable)."""
    import cv2

    eng = _tiny_engine()
    rng = np.random.default_rng(3)
    tall = (rng.random((64, 20, 3)) * 255).astype(np.uint8)
    staged = eng.stage_array(tall)
    assert staged.shape == (32, 32, 3) and staged.dtype == np.uint8

    for i in range(3):
        img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f"{i}.jpg"), img)
    (tmp_path / "broken.jpg").write_bytes(b"not a jpeg")
    feats, names = eng.embed_folder(tmp_path)
    assert names == ["0.jpg", "1.jpg", "2.jpg"]  # broken skipped, sorted
    assert feats.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-5)


def test_siglip_registry_geometries():
    from evr_tpu.models.siglip import SIGLIP_REGISTRY, get_siglip_config

    for name, cfg in SIGLIP_REGISTRY.items():
        # grid follows the VALID-conv floor (so400m: 384//14 = 27 — the
        # image size is deliberately NOT divisible by the patch size)
        v = cfg.vision
        conv_out = (v.image_size - v.patch_size) // v.patch_size + 1
        assert v.grid == conv_out > 0, name
        assert v.width % v.heads == 0, name
        assert cfg.text.width % cfg.text.heads == 0, name
    so400m = get_siglip_config("siglip-so400m-patch14-384")
    assert so400m.vision.width == 1152 and so400m.vision.layers == 27
    with pytest.raises(ValueError, match="unknown SigLIP"):
        get_siglip_config("nope")
