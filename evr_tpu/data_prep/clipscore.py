"""CLIPScore caption quality audit (E5 parity).

Reference counterpart: `Backend/kiemtra_saiso.py` — per (image, caption)
CLIP cosine similarity ×100; captions scoring below μ−2σ are flagged for
review; CSV report. Here the scores come from one batched device pass
through the EmbeddingEngine instead of per-pair forwards.
"""

from __future__ import annotations

import csv
import json
import pathlib



def clipscore_captions(
    engine,
    json_path,
    base_dir,
    out_csv=None,
    flag_sigma: float = 2.0,
) -> dict:
    """Score every (image, caption) pair; flag low outliers.

    Returns {'scores': [{path, caption, clipscore}], 'mean', 'std',
    'flagged': [...]}.
    """
    data = json.loads(pathlib.Path(json_path).read_text(encoding="utf-8"))
    base = pathlib.Path(base_dir)
    paths, captions = [], []
    for rel, meta in data.items():
        caption = meta.get("caption", "") if isinstance(meta, dict) else str(meta)
        full = base / rel
        if caption and full.exists():
            paths.append(full)
            captions.append(caption)
    if not paths:
        return {"scores": [], "mean": 0.0, "std": 0.0, "flagged": []}

    img = engine.encode_image_files(paths, normalise=True)
    txt = engine.encode_texts(captions, normalise=True)
    scores = (img * txt).sum(axis=1) * 100.0

    mean, std = float(scores.mean()), float(scores.std())
    threshold = mean - flag_sigma * std
    rows = [
        {"path": str(p), "caption": c, "clipscore": float(s)}
        for p, c, s in zip(paths, captions, scores)
    ]
    flagged = [r for r in rows if r["clipscore"] < threshold]

    if out_csv:
        with open(out_csv, "w", newline="", encoding="utf-8") as f:
            writer = csv.DictWriter(f, fieldnames=["path", "caption", "clipscore"])
            writer.writeheader()
            writer.writerows(rows)
    return {"scores": rows, "mean": mean, "std": std, "threshold": threshold, "flagged": flagged}
