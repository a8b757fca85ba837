"""Native C++ staging pipeline: build, decode parity vs the Python path,
failure reporting, threading."""

import numpy as np
import pytest

from evr_tpu.native import build_native, native_available

pytestmark = pytest.mark.skipif(
    build_native() is None, reason="native toolchain/libjpeg unavailable"
)


@pytest.fixture(scope="module")
def jpeg_set(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("jpegs")
    paths = []
    yy, xx = np.mgrid[0:300, 0:400]
    for i in range(4):
        arr = np.stack(
            [
                (127 + 120 * np.sin(xx / (20 + 5 * i))),
                (127 + 120 * np.cos(yy / (15 + 3 * i))),
                ((xx + yy + 37 * i) % 256),
            ],
            axis=-1,
        ).astype(np.uint8)
        p = d / f"img{i}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


def test_native_stage_matches_python(jpeg_set):
    from evr_tpu.index.engine import stage_image_fast
    from evr_tpu.native import NativeStager

    stager = NativeStager(image_size=224)
    out, ok = stager.stage_batch(jpeg_set)
    assert ok == list(range(len(jpeg_set)))
    assert out.shape == (len(jpeg_set), 224, 224, 3)
    for i, p in enumerate(jpeg_set):
        ref = stage_image_fast(p, 224).astype(np.int16)
        got = out[i].astype(np.int16)
        # independent decoders + resamplers: require close agreement
        assert np.abs(ref - got).mean() < 6.0
        assert np.corrcoef(ref.ravel(), got.ravel())[0, 1] > 0.98


def test_native_reports_failures(jpeg_set, tmp_path):
    from evr_tpu.native import NativeStager

    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg at all")
    missing = tmp_path / "missing.jpg"
    stager = NativeStager(image_size=64)
    out, ok = stager.stage_batch([jpeg_set[0], bad, missing, jpeg_set[1]])
    assert ok == [0, 3]
    assert out.shape[0] == 4


def test_native_threads_consistent(jpeg_set):
    from evr_tpu.native import NativeStager

    single = NativeStager(image_size=96, n_threads=1)
    multi = NativeStager(image_size=96, n_threads=4)
    out1, _ = single.stage_batch(jpeg_set * 3)
    out2, _ = multi.stage_batch(jpeg_set * 3)
    np.testing.assert_array_equal(out1, out2)


def test_native_available_flag():
    assert native_available()
