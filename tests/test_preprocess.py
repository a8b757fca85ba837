"""Device preprocessing vs exact PIL reference path."""

import numpy as np
import pytest

from evr_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD, load_image_host, preprocess_batch


@pytest.fixture()
def jpeg(tmp_path, rng):
    from PIL import Image

    # Structured (smooth) image: antialiasing filter differences on pure
    # noise are uncorrelated by construction; real frames are smooth.
    yy, xx = np.mgrid[0:480, 0:640]
    arr = np.stack(
        [
            127 + 127 * np.sin(xx / 40.0),
            127 + 127 * np.cos(yy / 25.0),
            (xx + yy) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    path = tmp_path / "frame.png"  # png: lossless, isolates resize differences
    Image.fromarray(arr).save(path)
    return path, arr


def test_device_matches_pil_reference(jpeg):
    path, arr = jpeg
    ref = load_image_host(path, 224)  # exact PIL bicubic + crop + normalize
    dev = np.asarray(preprocess_batch(arr[None], 224))[0]
    assert dev.shape == ref.shape == (224, 224, 3)
    # Antialiased bicubic implementations differ at edge pixels; require close
    # agreement in aggregate (this bounds retrieval-score drift).
    err = np.abs(dev - ref)
    assert err.mean() < 0.03, err.mean()
    assert np.corrcoef(dev.ravel(), ref.ravel())[0, 1] > 0.995


def test_normalization_constants():
    x = np.full((1, 224, 224, 3), 128, np.uint8)
    out = np.asarray(preprocess_batch(x, 224))[0]
    expected = (128 / 255.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(out[0, 0], expected, rtol=1e-5)


def test_stage_image_fast(jpeg):
    from evr_tpu.index.engine import stage_image_fast

    path, _ = jpeg
    staged = stage_image_fast(path, 224)
    assert staged.shape == (224, 224, 3) and staged.dtype == np.uint8
    # staged path vs PIL path should produce similar normalized tensors
    ref = load_image_host(path, 224)
    dev = np.asarray(preprocess_batch(staged[None], 224))[0]
    assert np.corrcoef(dev.ravel(), ref.ravel())[0, 1] > 0.98
