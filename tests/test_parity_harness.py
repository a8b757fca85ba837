"""The golden-parity harness itself, validated end-to-end with synthetic
golden fixtures: weights that produced the goldens must report PARITY OK."""

import json

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from evr_tpu.index import EmbeddingEngine
from evr_tpu.models import init_clip_params
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
from evr_tpu.models.torch_export import save_reference_checkpoint
from evr_tpu.tools import parity_check


def test_parity_harness_ok_roundtrip(tmp_path, rng):
    from PIL import Image

    cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=1),
        text=TextConfig(context_length=16, vocab_size=128, width=64, layers=2, heads=1),
    )
    params = init_clip_params(jax.random.PRNGKey(0), cfg)

    # fixture tree shaped like the reference Backend
    root = tmp_path / "Backend"
    frames_dir = root / "static" / "processed_frames" / "vid"
    frames_dir.mkdir(parents=True)
    (root / "embedding").mkdir()
    (root / "metadata").mkdir()
    names = []
    for i in (3, 11, 25):
        arr = np.zeros((80, 100, 3), np.uint8)
        arr[:, :, i % 3] = 60 + i * 5
        Image.fromarray(arr).save(frames_dir / f"{i}.jpg")
        names.append(f"{i}.jpg")

    engine = EmbeddingEngine(cfg=cfg, params=params, preprocess_mode="pil", batch_size=4)
    golden = engine.encode_image_files([frames_dir / n for n in names], normalise=True)
    np.save(root / "embedding" / "vid_embeddings.npy", golden)
    (root / "metadata" / "vid_metadata.json").write_text(
        json.dumps([{"frameid": n, "frameidx": int(n.split(".")[0])} for n in names])
    )

    ckpt = tmp_path / "weights.pt"
    save_reference_checkpoint(ckpt, params)

    rc = parity_check.main(
        [
            "--checkpoint", str(ckpt),
            "--reference-root", str(root),
            "--videos", "vid",
            "--top-k", "3",
        ]
    )
    assert rc == 0


def test_parity_harness_detects_divergence(tmp_path, rng):
    """Different weights than the goldens → non-zero exit."""
    from PIL import Image

    cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=1),
        text=TextConfig(context_length=16, vocab_size=128, width=64, layers=2, heads=1),
    )
    root = tmp_path / "Backend"
    frames_dir = root / "static" / "processed_frames" / "vid"
    frames_dir.mkdir(parents=True)
    (root / "embedding").mkdir()
    (root / "metadata").mkdir()
    names = []
    for i in (1, 2, 3, 4):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(frames_dir / f"{i}.jpg")
        names.append(f"{i}.jpg")
    golden = rng.normal(size=(4, 32)).astype(np.float32)
    np.save(root / "embedding" / "vid_embeddings.npy", golden)
    (root / "metadata" / "vid_metadata.json").write_text(
        json.dumps([{"frameid": n, "frameidx": i} for i, n in enumerate(names)])
    )
    ckpt = tmp_path / "w.pt"
    save_reference_checkpoint(ckpt, init_clip_params(jax.random.PRNGKey(5), cfg))
    rc = parity_check.main(
        ["--checkpoint", str(ckpt), "--reference-root", str(root), "--videos", "vid"]
    )
    assert rc == 1
