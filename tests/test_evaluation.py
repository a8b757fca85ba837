"""Evaluation harness: rank math against hand-computed cases, dual-direction
protocol, P@K multi-GT, comparison harness end-to-end, diagnostics."""

import numpy as np
import pytest

from evr_tpu.evaluation import (
    CaptionsTable,
    ModelComparison,
    calculate_metrics,
    evaluate_retrieval,
    metrics_from_ranks,
)
from evr_tpu.evaluation import diagnostics
from evr_tpu.evaluation.classification import evaluate_classification
from evr_tpu.evaluation.datasets import synthesize_from_folder


def test_metrics_from_ranks_hand_case():
    m = metrics_from_ranks(np.array([1, 2, 11, 4]))
    assert m["R@1"] == 0.25
    assert m["R@5"] == 0.75
    assert m["R@10"] == 0.75
    assert m["MRR"] == pytest.approx((1 + 0.5 + 1 / 11 + 0.25) / 4)
    assert m["Median_Rank"] == 3.0


def test_evaluate_retrieval_perfect_alignment():
    # orthogonal features: caption i matches image i exactly
    n = 6
    feats = np.eye(n, 8, dtype=np.float32)
    res = evaluate_retrieval(feats, feats, list(range(n)), list(range(n)))
    assert res["t2i"]["R@1"] == 1.0
    assert res["i2t"]["R@1"] == 1.0
    assert res["mean"]["rsum"] == pytest.approx(6.0)


def test_evaluate_retrieval_known_ranks():
    # 3 images along axes; caption prefers the wrong image at rank 2
    img = np.eye(3, 4, dtype=np.float32)
    txt = np.array(
        [
            [0.9, 1.0, 0.0, 0.0],  # gt image 0, but image 1 scores higher → rank 2
            [0.0, 1.0, 0.0, 0.0],  # gt image 1 → rank 1
            [0.0, 0.0, 1.0, 0.0],  # gt image 2 → rank 1
        ],
        dtype=np.float32,
    )
    res = evaluate_retrieval(img, txt, [0, 1, 2], [0, 1, 2])
    assert res["t2i_ranks"] == [2, 1, 1]
    assert res["t2i"]["R@1"] == pytest.approx(2 / 3)
    # i2t: image 0's caption (idx 0) ranks 2nd for image 0? image0 sims:
    # [0.9/norm, 0, 0] over captions → caption 0 best → rank 1
    assert res["i2t"]["R@1"] == 1.0


def test_i2t_best_of_multiple_captions():
    img = np.eye(2, 4, dtype=np.float32)
    # image 0 has 2 captions: one terrible, one perfect → best rank 1
    txt = np.array(
        [[0.0, 1.0, 0, 0], [1.0, 0.0, 0, 0], [0.0, 1.0, 0, 0]], dtype=np.float32
    )
    res = evaluate_retrieval(img, txt, [0, 0, 1], [0, 1])
    assert res["i2t_ranks"] == [1, 1]


def test_calculate_metrics_multi_gt_and_pk():
    sims = np.array([[0.9, 0.8, 0.7, 0.1]])
    metrics, ranks = calculate_metrics(sims, [[2, 1]])  # best GT rank = 2
    assert ranks.tolist() == [2]
    assert metrics["P@1"] == 0.0
    assert metrics["P@5"] == pytest.approx(2 / 5)


def test_model_comparison_end_to_end(tmp_path, rng):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(4):
        arr = np.zeros((32, 32, 3), np.uint8)
        arr[:, :, i % 3] = 50 + i * 40
        Image.fromarray(arr).save(img_dir / f"im{i}.jpg")
    dataset = synthesize_from_folder(img_dir)
    assert len(dataset.image_ids) == 4

    class RandomAdapter:
        def __init__(self, seed):
            self.rng = np.random.default_rng(seed)
            self.text_map = {}

        def encode_image_files(self, paths):
            return np.stack([self._vec(p) for p in paths])

        def encode_texts(self, texts):
            return np.stack([self._vec(t) for t in texts])

        def _vec(self, key):
            h = abs(hash(str(key))) % (2**32)
            v = np.random.default_rng(h).normal(size=16).astype(np.float32)
            return v / np.linalg.norm(v)

    class PerfectAdapter(RandomAdapter):
        def encode_texts(self, texts):
            # same vector as the image it captions ("a photo of imN")
            return np.stack(
                [self._vec(f"{t.split()[-1]}.jpg") for t in texts]
            )

        def encode_image_files(self, paths):
            import pathlib

            return np.stack([self._vec(pathlib.Path(p).name) for p in paths])

    comp = ModelComparison(output_dir=tmp_path / "out", log=lambda s: None)
    comp.register("random", lambda: RandomAdapter(0))
    comp.register("perfect", lambda: PerfectAdapter(1))
    results = comp.run_evaluation(dataset)
    assert results["perfect"]["mean"]["rsum"] == pytest.approx(6.0)
    assert results["random"]["mean"]["rsum"] <= results["perfect"]["mean"]["rsum"]
    json_path = comp.save_json()
    assert json_path.exists()
    table = comp.format_table()
    assert "perfect" in table and "rsum" in table


def test_classification_probe(rng):
    # linearly separable features
    n = 200
    labels = rng.integers(0, 3, size=n)
    centers = np.eye(3, 8) * 5
    feats = centers[labels] + rng.normal(size=(n, 8)) * 0.3
    report = evaluate_classification(feats.astype(np.float32), labels, 3)
    assert report["mode"] == "linear_probe"
    assert report["accuracy"] > 0.9
    assert 0 <= report["f1_macro"] <= 1


def test_diagnostics_suite():
    import jax

    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, init_clip_params

    cfg = CLIPConfig(
        embed_dim=16,
        vision=VisionConfig(32, 8, 32, 2, 2),
        text=TextConfig(16, 100, 32, 2, 2),
    )
    params = {"clip": init_clip_params(jax.random.PRNGKey(0), cfg)}
    report = diagnostics.run_all(params["clip"] | {}, freeze_layers=0)
    assert report["logit_scale"]["ok"]
    assert report["logit_scale"]["temperature"] == pytest.approx(0.07, abs=1e-3)
    assert report["dtype"]["ok"]

    feats = np.random.default_rng(0).normal(size=(5, 16))
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    assert diagnostics.check_embedding_norms(feats)["ok"]
    assert not diagnostics.check_embedding_norms(feats * 2.0)["ok"]

    sweep = diagnostics.batch_size_sweep(
        lambda b: b.sum(axis=-1), lambda n: np.ones((n, 4)), sizes=(1, 2)
    )
    assert sweep["ok"]
