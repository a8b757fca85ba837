"""Model deployment packager — the I6 capability, done portably.

Reference parity: `Backend/deploy_model_yolo.py` uploads trained YOLO
weights to Roboflow hosting (`version.deploy(model_type="yolov8",
model_path=...)`) with a hard-coded API key. That script is a thin
vendor-API call with no TPU relevance; the capability it provides —
"publish a trained model artifact to a serving/hosting target, versioned"
— is rebuilt here as:

- `build_bundle`: stage a model directory/file into a self-describing
  versioned bundle (manifest with model type, version, per-file SHA-256,
  byte sizes, user metadata) — the portable unit any hosting target
  consumes.
- Pluggable publishers: `LocalRegistryPublisher` (zero-egress default — a
  content-addressed directory registry with a `latest` pointer, suitable
  for shared filesystems / rsync targets) and `RoboflowPublisher`
  (dep-gated adapter calling the same `project.version(n).deploy(...)` API
  as the reference when the `roboflow` package and an API key are present;
  the key comes from an env var, never hard-coded).

CLI:
    python -m evr_tpu.tools.deploy_model path/to/weights \
        --model-type yolov8 --version 1 --registry /srv/model-registry
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import pathlib
import shutil
import time
from typing import Any


MANIFEST_NAME = "deploy_manifest.json"


def _sha256(path: pathlib.Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def build_bundle(
    model_path: str | pathlib.Path,
    out_dir: str | pathlib.Path,
    model_type: str,
    version: int = 1,
    metadata: dict[str, Any] | None = None,
) -> pathlib.Path:
    """Stage ``model_path`` (file or directory) into ``out_dir`` with a
    manifest. Returns the bundle directory."""
    src = pathlib.Path(model_path)
    if not src.exists():
        raise FileNotFoundError(f"model path {src} does not exist")
    bundle = pathlib.Path(out_dir)
    if bundle.exists():
        shutil.rmtree(bundle)
    bundle.mkdir(parents=True)

    files = []
    if src.is_file():
        shutil.copy2(src, bundle / src.name)
        files.append(src.name)
    else:
        for f in sorted(p for p in src.rglob("*") if p.is_file()):
            rel = f.relative_to(src)
            dest = bundle / rel
            dest.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(f, dest)
            files.append(str(rel))

    manifest = {
        "model_type": model_type,
        "version": int(version),
        "created_unix": int(time.time()),
        "files": [
            {
                "path": name,
                "sha256": _sha256(bundle / name),
                "bytes": (bundle / name).stat().st_size,
            }
            for name in files
        ],
        "metadata": metadata or {},
    }
    with open(bundle / MANIFEST_NAME, "w") as f:
        json.dump(manifest, f, indent=2)
    return bundle


def attach_aot_encoders(bundle: str | pathlib.Path, model) -> None:
    """Export AOT serving encoders (`serving/aot.py`) into ``<bundle>/aot/``
    and fold them into the deploy manifest — the bundle then carries the
    frozen StableHLO computation next to the weights, so a serving host
    needs no model code to run this model version. ``model`` is a registry
    name (e.g. ``"ViT-B/32"``) or a ``CLIPConfig``."""
    from evr_tpu.serving.aot import export_encoders, save_bundle as _save_aot

    if isinstance(model, str):
        from evr_tpu.models import get_model_config

        cfg = get_model_config(model)
        model_name = model
    else:
        cfg, model_name = model, getattr(model, "name", "custom")
    bundle = pathlib.Path(bundle)
    _save_aot(bundle / "aot", cfg, export_encoders(cfg))

    manifest = load_manifest(bundle)
    for f in sorted(p for p in (bundle / "aot").rglob("*") if p.is_file()):
        rel = str(f.relative_to(bundle))
        manifest["files"].append(
            {"path": rel, "sha256": _sha256(f), "bytes": f.stat().st_size}
        )
    manifest["metadata"]["aot_encoders"] = model_name
    with open(bundle / MANIFEST_NAME, "w") as f:
        json.dump(manifest, f, indent=2)


def load_manifest(bundle: str | pathlib.Path) -> dict:
    with open(pathlib.Path(bundle) / MANIFEST_NAME) as f:
        return json.load(f)


def verify_bundle(bundle: str | pathlib.Path) -> None:
    """Raise if any staged file is missing or fails its checksum."""
    bundle = pathlib.Path(bundle)
    manifest = load_manifest(bundle)
    for entry in manifest["files"]:
        p = bundle / entry["path"]
        if not p.exists():
            raise FileNotFoundError(f"bundle file missing: {entry['path']}")
        if _sha256(p) != entry["sha256"]:
            raise ValueError(f"checksum mismatch: {entry['path']}")


class LocalRegistryPublisher:
    """Content-addressed directory registry: bundles land at
    ``<root>/<model_type>/v<version>/`` and ``latest.json`` records the
    newest version — the zero-egress deployment target."""

    def __init__(self, root: str | pathlib.Path):
        self.root = pathlib.Path(root)

    def publish(self, bundle: str | pathlib.Path) -> pathlib.Path:
        bundle = pathlib.Path(bundle)
        verify_bundle(bundle)
        manifest = load_manifest(bundle)
        dest = self.root / manifest["model_type"] / f"v{manifest['version']}"
        if dest.exists():
            raise FileExistsError(
                f"{dest} already published — bump --version (registry "
                f"versions are immutable)"
            )
        dest.parent.mkdir(parents=True, exist_ok=True)
        tmp = dest.with_name(dest.name + ".tmp")
        if tmp.exists():
            shutil.rmtree(tmp)
        shutil.copytree(bundle, tmp)
        tmp.rename(dest)
        latest = {
            "model_type": manifest["model_type"],
            "version": manifest["version"],
            "path": str(dest),
        }
        with open(self.root / manifest["model_type"] / "latest.json", "w") as f:
            json.dump(latest, f, indent=2)
        return dest


class RoboflowPublisher:
    """Adapter for the reference's hosting target. Dep-gated like the
    OCR/YOLO annotators (`ingest/annotators.py`); the API key comes from
    ``ROBOFLOW_API_KEY`` (the reference hard-codes one in source —
    `deploy_model_yolo.py:5` — which this deliberately does not)."""

    def __init__(self, workspace: str, project: str, api_key: str | None = None):
        try:
            from roboflow import Roboflow  # type: ignore
        except ImportError as e:  # pragma: no cover - dep absent here
            raise ImportError(
                "roboflow package not installed; use LocalRegistryPublisher "
                "or `pip install roboflow` where egress is allowed"
            ) from e
        key = api_key or os.environ.get("ROBOFLOW_API_KEY")
        if not key:
            raise ValueError("set ROBOFLOW_API_KEY (never hard-code keys)")
        self._project = Roboflow(api_key=key).workspace(workspace).project(project)

    def publish(self, bundle: str | pathlib.Path) -> None:  # pragma: no cover
        bundle = pathlib.Path(bundle)
        verify_bundle(bundle)
        manifest = load_manifest(bundle)
        self._project.version(manifest["version"]).deploy(
            model_type=manifest["model_type"], model_path=str(bundle)
        )


def main(argv=None) -> None:
    from evr_tpu.utils.platform_pin import pin_platform_from_env

    pin_platform_from_env()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("model_path")
    ap.add_argument("--model-type", required=True)
    ap.add_argument("--version", type=int, default=1)
    ap.add_argument("--registry", help="local registry root (default target)")
    ap.add_argument("--roboflow", metavar="WORKSPACE/PROJECT",
                    help="publish to Roboflow instead (needs ROBOFLOW_API_KEY)")
    ap.add_argument("--staging-dir", default=None,
                    help="bundle staging dir (default: <model>/.deploy_bundle)")
    ap.add_argument("--meta", action="append", default=[],
                    metavar="KEY=VALUE", help="manifest metadata entries")
    ap.add_argument("--aot-encoders", metavar="MODEL",
                    help="also export AOT StableHLO serving encoders for this "
                         "model geometry (e.g. ViT-B/32) into the bundle")
    args = ap.parse_args(argv)

    metadata = dict(kv.split("=", 1) for kv in args.meta)
    staging = args.staging_dir or (
        str(pathlib.Path(args.model_path).with_suffix("")) + ".deploy_bundle"
    )
    bundle = build_bundle(
        args.model_path, staging, args.model_type, args.version, metadata
    )
    if args.aot_encoders:
        attach_aot_encoders(bundle, args.aot_encoders)
    print(f"bundle: {bundle} ({len(load_manifest(bundle)['files'])} files)")
    if args.roboflow:
        ws, proj = args.roboflow.split("/", 1)
        RoboflowPublisher(ws, proj).publish(bundle)
        print(f"published to roboflow {args.roboflow} v{args.version}")
    elif args.registry:
        dest = LocalRegistryPublisher(args.registry).publish(bundle)
        print(f"published: {dest}")


if __name__ == "__main__":
    main()
