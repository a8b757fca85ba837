"""REAL end-to-end pod-simulation of the advertised RUNBOOK recipe:
`pod_launch -n 2 --cpu-devices 2 -- finetune --fsdp --save-every-steps N`
on the ViT-Tiny-Test geometry — 2 OS processes, Gloo collectives, fsdp
state sharding, mid-epoch autosave, then a resumed run from the autosave.
This is the full multi-host production path driven through the CLIs only.
"""

import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("podcli")
    frames = root / "imgs"
    frames.mkdir()
    rng = np.random.default_rng(0)
    caps = {}
    for i in range(16):
        name = f"f{i:02d}.jpg"
        Image.fromarray(
            (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        ).save(frames / name)
        caps[name] = {
            "caption": f"synthetic frame number {i}",
            "category": ["Violence", "NonViolence"][i % 2],
        }
    (root / "caps.json").write_text(json.dumps(caps))
    return root


def _run_pod(dataset, save_dir, extra):
    cmd = [
        sys.executable, "-m", "evr_tpu.tools.pod_launch",
        "-n", "2", "--cpu-devices", "2", "--",
        sys.executable, "-m", "evr_tpu.tools.finetune",
        "--train-json", str(dataset / "caps.json"),
        "--data-dir", str(dataset / "imgs"),
        "--model", "ViT-Tiny-Test",
        "--batch-size", "8", "--epochs", "1", "--freeze-layers", "0",
        "--save-dir", str(save_dir),
        "--fsdp",
    ] + extra
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    return subprocess.run(
        cmd, env=env, cwd=str(REPO), capture_output=True, text=True, timeout=900
    )


def test_pod_cli_finetune_fsdp_autosave_resume(dataset, tmp_path):
    save_dir = tmp_path / "ckpt"
    out = _run_pod(dataset, save_dir, ["--save-every-steps", "1"])
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    assert (save_dir / "final_checkpoint").exists()
    assert (save_dir / "autosave").exists()

    out2 = _run_pod(dataset, save_dir, ["--resume-from", "autosave"])
    assert out2.returncode == 0, out2.stdout[-4000:] + out2.stderr[-2000:]
    assert "resumed from autosave mid-epoch" in out2.stdout
