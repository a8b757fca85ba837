"""Differential ContentDetector vectors (VERDICT r4 #8).

The scene goldens (`tests/test_scene_golden.py`) freeze THIS repo's curve
against refactors; these vectors instead pin the implementation to the
PUBLISHED PySceneDetect ContentDetector algorithm
(`Backend/segment_video.py:6-28` wraps it at threshold 30):

    frame_score = (delta_hue + delta_sat + delta_lum) / 3
    delta_X     = mean(|cur_X - prev_X|)  over pixels, cv2 HSV channels
    cut at frame i  iff  score[i] >= threshold
                    and  i - last_cut >= min_scene_len   (default 15)

Every expected value below is computed BY HAND from that formula and
OpenCV's documented 8-bit HSV ranges (H in [0,180), S,V in [0,255]):
pure red BGR(0,0,255) -> HSV(0,255,255), green -> (60,255,255),
blue -> (120,255,255), white -> (0,0,255), black -> (0,0,0).
None of these numbers came from running this repo's code.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from evr_tpu.ingest.scene import _content_val, cuts_from_curve


def _uniform_hsv(bgr, h=4, w=6):
    frame = np.zeros((h, w, 3), np.uint8)
    frame[:] = bgr
    return cv2.cvtColor(frame, cv2.COLOR_BGR2HSV)


RED, GREEN, BLUE = (0, 0, 255), (0, 255, 0), (255, 0, 0)
WHITE, BLACK = (255, 255, 255), (0, 0, 0)


def test_hand_computed_color_pair_scores():
    # red->green: |60-0|/3 = 20 exactly (S and V deltas are 0)
    assert _content_val(_uniform_hsv(RED), _uniform_hsv(GREEN)) == 20.0
    # red->blue: |120-0|/3 = 40
    assert _content_val(_uniform_hsv(RED), _uniform_hsv(BLUE)) == 40.0
    # black->white: only V changes, 255/3 = 85
    assert _content_val(_uniform_hsv(BLACK), _uniform_hsv(WHITE)) == 85.0
    # white->red: S 0->255, H and V unchanged: 255/3 = 85
    assert _content_val(_uniform_hsv(WHITE), _uniform_hsv(RED)) == 85.0
    # identical frames score 0
    assert _content_val(_uniform_hsv(GREEN), _uniform_hsv(GREEN)) == 0.0


def test_hand_computed_mixed_pixel_score():
    # 2x2 frames differing in ONE pixel's V by 200 (rest identical):
    # delta_lum mean = 200/4 = 50, score = 50/3
    prev = np.zeros((2, 2, 3), np.uint8)
    cur = prev.copy()
    cur[0, 0, 2] = 200  # V channel of cv2 HSV layout
    assert _content_val(prev, cur) == pytest.approx(200 / 4 / 3)


def test_hand_computed_per_channel_average():
    # all three channels shift uniformly: H +6, S +9, V +12
    # score = (6 + 9 + 12)/3 = 9
    prev = np.full((3, 5, 3), 40, np.uint8)
    cur = prev + np.array([6, 9, 12], np.uint8)
    assert _content_val(prev, cur) == 9.0


def test_threshold_30_on_color_pairs():
    # segment_video.py wraps ContentDetector(threshold=30): red->green (20)
    # must NOT cut, red->blue (40) must
    curve = [0.0, 20.0, 40.0]
    assert cuts_from_curve(np.asarray(curve), 30.0, min_scene_len=1) == [2]


def test_min_scene_len_walk():
    # PySceneDetect: cut iff score >= T and (i - last_cut) >= min_scene_len,
    # last_cut starting at the first frame. Hand walk of
    # [0, 40, 40, 5, 40] with T=30, msl=2: i=1 blocked (1-0 < 2),
    # i=2 cuts, i=3 below T, i=4 cuts (4-2 >= 2).
    curve = np.asarray([0.0, 40.0, 40.0, 5.0, 40.0])
    assert cuts_from_curve(curve, 30.0, min_scene_len=2) == [2, 4]
    # default msl=15 suppresses everything in a 5-frame clip
    assert cuts_from_curve(curve, 30.0, min_scene_len=15) == []
    # threshold comparison is >= (PySceneDetect uses score >= threshold)
    assert cuts_from_curve(np.asarray([0.0, 30.0]), 30.0, 1) == [1]


def test_end_to_end_synthetic_video(tmp_path):
    # 3 uniform color segments (red/green/white, 20 frames each) through the
    # REAL video path: the red->green join scores ~20 (no cut at T=30), the
    # green->white join scores (|0-60| + |0-255| + 0)/3 = 105 -> exactly one
    # cut at frame 40. (Codec noise moves scores by ~1, far from either
    # threshold margin.)
    from evr_tpu.ingest.scene import ContentDetectorConfig, detect_scenes

    path = tmp_path / "tri.mp4"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 64))
    for color in (RED, GREEN, WHITE):
        frame = np.zeros((64, 64, 3), np.uint8)
        frame[:] = color
        for _ in range(20):
            w.write(frame)
    w.release()
    scenes = detect_scenes(path, ContentDetectorConfig(threshold=30.0))
    assert scenes == [(0, 40), (40, 60)]
    # at threshold 15 the green join cuts too
    scenes = detect_scenes(path, ContentDetectorConfig(threshold=15.0))
    assert scenes == [(0, 20), (20, 40), (40, 60)]
