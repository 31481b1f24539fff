"""Mouth-ROI extraction: landmark interpolation, temporal smoothing,
similarity warp to the mean face, 96x96 mouth crop.

Behavioural equivalent of `preprocessing_inference_example/video_process.py:
55-217` (and the batch pipelines under `av_hubert/avhubert/preparation/`),
built on numpy + cv2:

  1. frames with no detection get landmarks linearly interpolated from the
     nearest detected neighbours (`:120-145`)
  2. landmarks are smoothed with a 12-frame sliding mean window (`:90-96`)
  3. a similarity transform (estimated on the stable landmark subset) maps
     each frame onto the mean face in a 256x256 canvas (`:147-169`)
  4. a 96x96 patch centred on the warped mouth landmarks (48..67) is cut
     (`:171-217`).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

STABLE_POINTS = list(range(17, 36)) + list(range(36, 48))  # brows+nose+eyes
MOUTH_POINTS = list(range(48, 68))


def interpolate_landmarks(landmarks: List[Optional[np.ndarray]]) -> List[np.ndarray]:
    """Fill None frames by linear interpolation between detected neighbours;
    leading/trailing gaps copy the nearest detection."""
    idx = [i for i, lm in enumerate(landmarks) if lm is not None]
    if not idx:
        raise ValueError("no faces detected in any frame")
    out: List[np.ndarray] = [None] * len(landmarks)  # type: ignore
    for i, lm in enumerate(landmarks):
        if lm is not None:
            out[i] = np.asarray(lm, np.float64)
    for a, b in zip(idx[:-1], idx[1:]):
        for i in range(a + 1, b):
            w = (i - a) / (b - a)
            out[i] = (1 - w) * out[a] + w * out[b]
    for i in range(0, idx[0]):
        out[i] = out[idx[0]]
    for i in range(idx[-1] + 1, len(landmarks)):
        out[i] = out[idx[-1]]
    return out


def smooth_landmarks(landmarks: Sequence[np.ndarray], window: int = 12) -> List[np.ndarray]:
    """Sliding mean over a `window`-frame neighbourhood (`:90-96`)."""
    arr = np.stack(landmarks)  # (T, 68, 2)
    T = len(arr)
    out = []
    half = window // 2
    for i in range(T):
        lo, hi = max(0, i - half), min(T, i + half + 1)
        out.append(arr[lo:hi].mean(axis=0))
    return out


def estimate_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform src -> dst; returns 2x3 matrix."""
    import cv2

    m, _ = cv2.estimateAffinePartial2D(
        src.astype(np.float64), dst.astype(np.float64), method=cv2.LMEDS
    )
    if m is None:  # degenerate fallback: identity
        m = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    return m


def warp_frame(frame: np.ndarray, m: np.ndarray, size: int = 256) -> np.ndarray:
    import cv2

    return cv2.warpAffine(frame, m, (size, size), flags=cv2.INTER_LINEAR)


def cut_mouth_patch(
    frame: np.ndarray,
    warped_landmarks: np.ndarray,
    height: int = 96,
    width: int = 96,
) -> np.ndarray:
    """Crop around the mouth-landmark centroid, clamped to the canvas
    (`:171-217`)."""
    center = warped_landmarks[MOUTH_POINTS].mean(axis=0)
    H, W = frame.shape[:2]
    cx = int(round(np.clip(center[0], width // 2, W - width // 2)))
    cy = int(round(np.clip(center[1], height // 2, H - height // 2)))
    return frame[cy - height // 2: cy + height // 2, cx - width // 2: cx + width // 2]


def apply_transform_to_landmarks(lms: np.ndarray, m: np.ndarray) -> np.ndarray:
    return lms @ m[:, :2].T + m[:, 2]


def extract_mouth_rois(
    frames: np.ndarray,  # (T, H, W, 3) uint8
    landmarks: List[Optional[np.ndarray]],  # per-frame (68, 2) or None
    mean_face: np.ndarray,  # (68, 2)
    crop_size: int = 96,
    canvas: int = 256,
    smooth_window: int = 12,
) -> np.ndarray:
    """Full deterministic tail -> (T, crop, crop, 3) uint8 mouth ROIs."""
    lms = smooth_landmarks(interpolate_landmarks(landmarks), smooth_window)
    out = []
    for frame, lm in zip(frames, lms):
        m = estimate_similarity(lm[STABLE_POINTS], mean_face[STABLE_POINTS])
        warped = warp_frame(frame, m, canvas)
        wlm = apply_transform_to_landmarks(lm, m)
        out.append(cut_mouth_patch(warped, wlm, crop_size, crop_size))
    return np.stack(out)
