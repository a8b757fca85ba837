"""Projection alignment: a rotated+shifted feature space is recovered by
the ridge fit; the projected adapter plugs into the comparison harness."""

import numpy as np
import pytest

from evr_tpu.evaluation.projection_align import (
    ProjectedAdapter,
    apply_projection,
    fit_projection,
    statistical_renormalize,
)


def test_fit_recovers_affine_map(rng):
    Ds, Dt, n = 24, 16, 400
    A = rng.normal(size=(Ds, Dt)).astype(np.float64)
    b = rng.normal(size=Dt)
    src = rng.normal(size=(n, Ds))
    tgt = src @ A + b + rng.normal(size=(n, Dt)) * 0.01
    W = fit_projection(src, tgt, l2=1e-4)
    pred = apply_projection(src, W)
    err = np.abs(pred - tgt).mean()
    assert err < 0.05, err
    # held-out generalisation
    src2 = rng.normal(size=(50, Ds))
    pred2 = apply_projection(src2, W)
    np.testing.assert_allclose(pred2, src2 @ A + b, atol=0.3)


def test_statistical_renormalize(rng):
    x = rng.normal(size=(200, 8)) * 5 + 3
    t_mean = np.zeros((1, 8))
    t_std = np.ones((1, 8)) * 0.5
    out = statistical_renormalize(x, t_mean, t_std)
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-6)
    np.testing.assert_allclose(out.std(axis=0), 0.5, rtol=1e-5)


def test_projected_adapter_in_harness(rng, tmp_path):
    """A 'foreign' encoder (rotation of the CLIP space) reaches perfect
    retrieval after alignment."""
    from PIL import Image

    from evr_tpu.evaluation import ModelComparison
    from evr_tpu.evaluation.datasets import synthesize_from_folder

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(6):
        Image.new("RGB", (16, 16), (40 * i, 10, 10)).save(img_dir / f"im{i}.jpg")
    dataset = synthesize_from_folder(img_dir)

    D = 12
    R = np.linalg.qr(rng.normal(size=(D, D)))[0]  # rotation

    def vec(key):
        h = abs(hash(str(key))) % (2**32)
        v = np.random.default_rng(h).normal(size=D)
        return (v / np.linalg.norm(v)).astype(np.float64)

    class ClipLike:
        def encode_image_files(self, paths):
            import pathlib

            return np.stack([vec(pathlib.Path(p).name) for p in paths])

        def encode_texts(self, texts):
            return np.stack([vec(f"{t.split()[-1]}.jpg") for t in texts])

    class Foreign:
        def encode_image_files(self, paths):
            return ClipLike().encode_image_files(paths) @ R  # rotated space

    clip_like = ClipLike()
    foreign = Foreign()
    # fit on the same images (as the reference does with paired features)
    src = foreign.encode_image_files(dataset.ordered_paths)
    tgt = clip_like.encode_image_files(dataset.ordered_paths)
    W = fit_projection(src, tgt, l2=1e-6)

    comp = ModelComparison(output_dir=tmp_path / "out", log=lambda s: None)
    comp.register("aligned", lambda: ProjectedAdapter(foreign, clip_like, W))
    results = comp.run_evaluation(dataset)
    assert results["aligned"]["t2i"]["R@1"] == 1.0
