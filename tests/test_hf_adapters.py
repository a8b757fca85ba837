"""HF adapters for the comparison harness (E1's FLAVA / OpenCLIP / ViT+proj
entries — `compare_models.py:306-344,423-472`). Tiny models are constructed
locally from configs with fake processors, so no network or HF cache is
needed."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from evr_tpu.evaluation.compare import ModelComparison
from evr_tpu.evaluation.datasets import CaptionsTable
from evr_tpu.evaluation.hf_adapters import (
    FlavaAdapter,
    HFCLIPAdapter,
    ViTEncoderAdapter,
)
from evr_tpu.evaluation.projection_align import ProjectedAdapter, fit_projection


class FakeProcessor:
    """Mimics HF processors for 32x32 models with a 100-token vocab."""

    def __call__(self, images=None, text=None, return_tensors="pt", **kw):
        out = {}
        if images is not None:
            px = [
                torch.from_numpy(
                    np.asarray(im.resize((32, 32)), np.float32).transpose(2, 0, 1)
                    / 255.0
                )
                for im in images
            ]
            out["pixel_values"] = torch.stack(px)
        if text is not None:
            ids = torch.zeros((len(text), 8), dtype=torch.long)
            for r, t in enumerate(text):
                for c, word in enumerate(t.split()[:8]):
                    ids[r, c] = (hash(word) % 98) + 2
            out["input_ids"] = ids
            out["attention_mask"] = (ids != 0).long()
        return out


def _tiny_clip():
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        text_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=2, vocab_size=100,
                         max_position_embeddings=16),
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=2, image_size=32, patch_size=8),
        projection_dim=16,
    )
    torch.manual_seed(0)
    return CLIPModel(cfg)


def _tiny_flava():
    from transformers import FlavaConfig, FlavaModel

    cfg = FlavaConfig(
        image_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                          num_attention_heads=2, image_size=32, patch_size=8),
        text_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=2, vocab_size=100,
                         max_position_embeddings=16),
        multimodal_config=dict(hidden_size=32, intermediate_size=64,
                               num_hidden_layers=1, num_attention_heads=2),
        hidden_size=32,
    )
    torch.manual_seed(1)
    return FlavaModel(cfg)


def _tiny_vit():
    from transformers import ViTConfig, ViTModel

    torch.manual_seed(2)
    return ViTModel(
        ViTConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                  num_attention_heads=2, image_size=32, patch_size=8)
    )


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("hf_imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        p = root / f"img_{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    return paths


def _dataset(paths):
    ds = CaptionsTable()
    for i, p in enumerate(paths):
        ds.add_image(f"im{i}", p)
        ds.add_caption(f"caption number {i} scene", f"im{i}")
    return ds


def test_hf_clip_adapter_shapes_and_norm(image_files):
    ad = HFCLIPAdapter(_tiny_clip(), processor=FakeProcessor(), batch_size=4)
    img = ad.encode_image_files(image_files)
    txt = ad.encode_texts(["a dog", "street fight at night"])
    assert img.shape == (6, 16) and txt.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(img, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(txt, axis=1), 1.0, rtol=1e-5)


def test_flava_adapter_cls_pooling(image_files):
    ad = FlavaAdapter(_tiny_flava(), processor=FakeProcessor(), batch_size=4)
    img = ad.encode_image_files(image_files[:3])
    txt = ad.encode_texts(["one", "two words here"])
    assert img.shape == (3, 32) and txt.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(img, axis=1), 1.0, rtol=1e-5)


def test_vit_projection_into_clip_space(image_files):
    clip_ad = HFCLIPAdapter(_tiny_clip(), processor=FakeProcessor(), batch_size=4)
    vit_ad = ViTEncoderAdapter(_tiny_vit(), preprocess=FakeProcessor(), batch_size=4)
    with pytest.raises(NotImplementedError):
        vit_ad.encode_texts(["x"])
    vit_feats = vit_ad.encode_image_files(image_files)
    clip_feats = clip_ad.encode_image_files(image_files)
    W = fit_projection(vit_feats, clip_feats)
    proj = ProjectedAdapter(vit_ad, clip_ad, W)
    img = proj.encode_image_files(image_files)
    assert img.shape == (6, 16)
    # projection trained on these pairs should land near the CLIP features
    cos = np.sum(img * clip_feats, axis=1)
    assert (cos > 0.5).all(), cos


def test_comparison_harness_with_hf_zoo(image_files, tmp_path):
    ds = _dataset(image_files)
    cmp = ModelComparison(output_dir=tmp_path, log=lambda *_: None)
    cmp.register("HF-CLIP", lambda: HFCLIPAdapter(_tiny_clip(), processor=FakeProcessor()))
    cmp.register("Flava", lambda: FlavaAdapter(_tiny_flava(), processor=FakeProcessor()))
    results = cmp.run_evaluation(ds)
    assert set(results) == {"HF-CLIP", "Flava"}
    for r in results.values():
        assert 0.0 <= r["mean"]["R@1"] <= 1.0
        assert r["mean"]["rsum"] > 0
    assert cmp.save_json().exists()
    assert cmp.save_csv().exists()
