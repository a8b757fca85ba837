"""Generate the scene-detection golden fixtures (tests/golden/scenes/).

Renders three small synthetic videos covering the detector's behaviours —
a hard two-scene cut, a gradual fade (sub-threshold deltas), and rapid
cuts closer together than min_scene_len — encodes them to .avi (MJPG:
per-frame JPEG, no temporal compression, so decode is stable across
ffmpeg/OpenCV builds), and records the expected content-value curve and
cut lists at several thresholds into golden.json.

The fixtures pin the IMPLEMENTED semantics (a reimplementation of
PySceneDetect ContentDetector's HSV-delta algorithm,
`/root/reference/Backend/segment_video.py:6-28`) so any refactor that
shifts a cut or a content value fails tests/test_scene_golden.py.

Re-run after an INTENTIONAL semantics change:
    python tools/gen_scene_golden.py
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

GOLDEN_DIR = pathlib.Path(__file__).parent.parent / "tests" / "golden" / "scenes"
W, H, FPS = 96, 64, 20.0
THRESHOLDS = (10.0, 20.0, 30.0, 60.0)
MIN_SCENE_LENS = (2, 15)


def _frames_hard_cut():
    """60 red-ish frames, hard cut, 60 blue-ish frames; mild noise."""
    rng = np.random.default_rng(0)
    frames = []
    for i in range(120):
        base = (40, 40, 200) if i < 60 else (200, 60, 40)  # BGR
        f = np.tile(np.asarray(base, np.uint8), (H, W, 1))
        f = np.clip(f.astype(np.int16) + rng.integers(-12, 13, size=(H, W, 3)), 0, 255)
        frames.append(f.astype(np.uint8))
    return frames


def _frames_fade():
    """Linear 100-frame fade black→white: per-frame delta stays small."""
    frames = []
    for i in range(100):
        v = int(round(255 * i / 99))
        frames.append(np.full((H, W, 3), v, np.uint8))
    return frames


def _frames_rapid_cuts():
    """Colour flips every 5 frames — closer than the default min_scene_len,
    so min-length enforcement decides which cuts register."""
    rng = np.random.default_rng(1)
    palette = [(200, 40, 40), (40, 200, 40), (40, 40, 200), (200, 200, 40)]
    frames = []
    for i in range(80):
        base = palette[(i // 5) % len(palette)]
        f = np.tile(np.asarray(base, np.uint8), (H, W, 1))
        f = np.clip(f.astype(np.int16) + rng.integers(-8, 9, size=(H, W, 3)), 0, 255)
        frames.append(f.astype(np.uint8))
    return frames


VIDEOS = {
    "hard_cut": _frames_hard_cut,
    "fade": _frames_fade,
    "rapid_cuts": _frames_rapid_cuts,
}


def write_video(path: pathlib.Path, frames) -> None:
    import cv2

    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"MJPG"), FPS, (W, H)
    )
    assert writer.isOpened(), f"cannot open writer for {path}"
    for f in frames:
        writer.write(f)
    writer.release()


def main() -> None:
    from evr_tpu.ingest.scene import (
        ContentDetectorConfig,
        content_curve,
        cuts_from_curve,
    )

    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    golden: dict = {"fps": FPS, "width": W, "height": H, "videos": {}}
    for name, gen in VIDEOS.items():
        path = GOLDEN_DIR / f"{name}.avi"
        write_video(path, gen())
        curve = content_curve(path, ContentDetectorConfig(downscale=1))
        entry = {
            "n_frames": int(len(curve)),
            "curve": [round(float(v), 4) for v in curve],
            "cuts": {},
        }
        for thr in THRESHOLDS:
            for msl in MIN_SCENE_LENS:
                entry["cuts"][f"t{thr:g}_m{msl}"] = cuts_from_curve(curve, thr, msl)
        golden["videos"][name] = entry
        print(f"{name}: {len(curve)} frames, "
              f"cuts@30/15={entry['cuts']['t30_m15']}, "
              f"size={path.stat().st_size} B")
    (GOLDEN_DIR / "golden.json").write_text(json.dumps(golden, indent=1))
    print(f"wrote {GOLDEN_DIR / 'golden.json'}")


if __name__ == "__main__":
    main()
