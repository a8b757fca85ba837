"""Model deployment packager (`tools/deploy_model.py`) — the I6
capability (reference: `Backend/deploy_model_yolo.py` Roboflow upload)
rebuilt as versioned checksummed bundles + pluggable publishers."""

import json
import subprocess
import sys

import pytest

from evr_tpu.tools.deploy_model import (
    LocalRegistryPublisher,
    RoboflowPublisher,
    build_bundle,
    load_manifest,
    verify_bundle,
)


@pytest.fixture
def model_dir(tmp_path):
    src = tmp_path / "weights"
    (src / "sub").mkdir(parents=True)
    (src / "model.bin").write_bytes(b"\x00\x01" * 100)
    (src / "sub" / "labels.txt").write_text("violence\nnsfw\nneutral\n")
    return src


def test_bundle_manifest_and_checksums(model_dir, tmp_path):
    bundle = build_bundle(
        model_dir, tmp_path / "b", "yolov8", version=3, metadata={"note": "x"}
    )
    m = load_manifest(bundle)
    assert m["model_type"] == "yolov8" and m["version"] == 3
    assert {f["path"] for f in m["files"]} == {"model.bin", "sub/labels.txt"}
    assert all(len(f["sha256"]) == 64 for f in m["files"])
    verify_bundle(bundle)  # no raise


def test_verify_catches_corruption(model_dir, tmp_path):
    bundle = build_bundle(model_dir, tmp_path / "b", "yolov8")
    (bundle / "model.bin").write_bytes(b"tampered")
    with pytest.raises(ValueError, match="checksum"):
        verify_bundle(bundle)


def test_local_registry_publish_and_latest(model_dir, tmp_path):
    bundle = build_bundle(model_dir, tmp_path / "b", "yolov8", version=1)
    reg = LocalRegistryPublisher(tmp_path / "registry")
    dest = reg.publish(bundle)
    assert (dest / "model.bin").exists()
    latest = json.loads(
        (tmp_path / "registry" / "yolov8" / "latest.json").read_text()
    )
    assert latest["version"] == 1 and latest["path"] == str(dest)

    # versions are immutable
    with pytest.raises(FileExistsError, match="immutable"):
        reg.publish(bundle)

    # v2 becomes latest
    b2 = build_bundle(model_dir, tmp_path / "b2", "yolov8", version=2)
    reg.publish(b2)
    latest = json.loads(
        (tmp_path / "registry" / "yolov8" / "latest.json").read_text()
    )
    assert latest["version"] == 2


def test_roboflow_adapter_is_dep_gated():
    with pytest.raises((ImportError, ValueError)):
        RoboflowPublisher("ws", "proj")


def test_cli_end_to_end(model_dir, tmp_path):
    out = subprocess.run(
        [
            sys.executable, "-m", "evr_tpu.tools.deploy_model",
            str(model_dir), "--model-type", "yolov8", "--version", "1",
            "--registry", str(tmp_path / "reg"),
            "--staging-dir", str(tmp_path / "stage"),
            "--meta", "run=42",
        ],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    assert "published:" in out.stdout
    latest = json.loads((tmp_path / "reg" / "yolov8" / "latest.json").read_text())
    m = load_manifest(latest["path"])
    assert m["metadata"] == {"run": "42"}


def test_attach_aot_encoders(model_dir, tmp_path):
    """AOT StableHLO encoders land inside the bundle, manifest-tracked and
    checksum-verifiable, and the reloaded artifact actually encodes."""
    import numpy as np
    import jax

    from evr_tpu.models.clip import (
        CLIPConfig, TextConfig, VisionConfig, init_clip_params,
    )
    from evr_tpu.serving.aot import load_bundle as load_aot
    from evr_tpu.tools.deploy_model import attach_aot_encoders, verify_bundle

    cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=TextConfig(context_length=16, vocab_size=600, width=64, layers=2, heads=4),
    )
    b = build_bundle(model_dir, tmp_path / "b_aot", "clip", version=1)
    attach_aot_encoders(b, cfg)
    verify_bundle(b)  # new files are in the manifest with valid checksums
    m = load_manifest(b)
    assert m["metadata"]["aot_encoders"] == "custom"
    assert any(f["path"].startswith("aot/") for f in m["files"])

    enc = load_aot(b / "aot")
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    toks = np.zeros((2, 16), np.int32)
    toks[:, 0] = 1
    toks[:, 1] = 599
    out = enc.encode_tokens(params, toks)
    assert out.shape == (2, 32) and np.isfinite(out).all()
