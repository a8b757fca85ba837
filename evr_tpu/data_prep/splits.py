"""Dataset split/merge utilities.

Reference counterparts (`content/Merge_data_NSFW_Violence/`): 80/20 split
with seed 42 (`chia_dataset.py:17`), merging Sensitive data into Violence
caption sets, and a mixed classification test-set builder
(`mix_images_classification.py`). Caption JSONs use the training schema:
``{relative_image_path: {"caption": ..., "category": ...}}``.
"""

from __future__ import annotations

import json
import pathlib
import shutil

import numpy as np


def split_caption_json(
    json_path,
    out_train,
    out_val,
    val_fraction: float = 0.2,
    seed: int = 42,
) -> tuple[int, int]:
    """Deterministic 80/20 split of a caption JSON. Returns (n_train, n_val)."""
    data = json.loads(pathlib.Path(json_path).read_text(encoding="utf-8"))
    keys = sorted(data)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(keys))
    n_val = int(len(keys) * val_fraction)
    val_keys = {keys[i] for i in order[:n_val]}
    train = {k: v for k, v in data.items() if k not in val_keys}
    val = {k: v for k, v in data.items() if k in val_keys}
    pathlib.Path(out_train).write_text(json.dumps(train, indent=2, ensure_ascii=False))
    pathlib.Path(out_val).write_text(json.dumps(val, indent=2, ensure_ascii=False))
    return len(train), len(val)


def merge_caption_jsons(json_paths, out_path, category_override: str | None = None) -> int:
    """Merge caption JSONs (later files win on key collision); optionally
    force a category (the Sensitive→Violence merge)."""
    merged: dict = {}
    for p in json_paths:
        data = json.loads(pathlib.Path(p).read_text(encoding="utf-8"))
        for k, v in data.items():
            if category_override is not None:
                v = dict(v) | {"category": category_override}
            merged[k] = v
    pathlib.Path(out_path).write_text(json.dumps(merged, indent=2, ensure_ascii=False))
    return len(merged)


def canonicalize_caption_json(json_path, out_path=None) -> int:
    """Sort a caption JSON by (category, numeric frame index) — the
    reference's `sapxep_script_data_video.py` canonical ordering. Returns
    the entry count; writes in place when out_path is None."""
    import re

    path = pathlib.Path(json_path)
    data = json.loads(path.read_text(encoding="utf-8"))

    def key(item):
        rel, meta = item
        category = meta.get("category", "") if isinstance(meta, dict) else ""
        nums = re.findall(r"(\d+)", pathlib.PurePosixPath(rel).stem)
        return (category, int(nums[-1]) if nums else 0, rel)

    ordered = dict(sorted(data.items(), key=key))
    (pathlib.Path(out_path) if out_path else path).write_text(
        json.dumps(ordered, indent=2, ensure_ascii=False)
    )
    return len(ordered)


def build_mixed_testset(
    class_dirs: dict[str, str],
    out_dir,
    per_class: int = 50,
    seed: int = 42,
    copy: bool = True,
) -> dict[str, list[str]]:
    """Sample per_class images from each labelled folder into a mixed test
    set; returns {class: [filenames]} and writes a labels.json manifest."""
    rng = np.random.default_rng(seed)
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    manifest: dict[str, list[str]] = {}
    for cls, d in class_dirs.items():
        files = sorted(
            p for p in pathlib.Path(d).iterdir() if p.suffix.lower() in (".jpg", ".jpeg", ".png")
        )
        picks = rng.permutation(len(files))[: min(per_class, len(files))]
        chosen = []
        for i in picks:
            src = files[int(i)]
            dst_name = f"{cls}_{src.name}"
            if copy:
                shutil.copy2(src, out_dir / dst_name)
            chosen.append(dst_name)
        manifest[cls] = chosen
    (out_dir / "labels.json").write_text(json.dumps(manifest, indent=2))
    return manifest
