"""Mouth-ROI extraction: landmark interpolation, temporal smoothing,
similarity warp to the mean face, 96x96 mouth crop.

Reference-exact tail of `preprocessing_inference_example/video_process.py`
(the pipeline that produced the preprocessed LRS3 corpora), numpy + cv2:

  1. frames with no detection get landmarks linearly interpolated from the
     nearest detected neighbours; leading/trailing gaps copy the nearest
     detection (`video_process.py:120-145`)
  2. per frame, landmarks are smoothed over a SYMMETRIC window that shrinks
     near clip edges (`min(margin//2, i, T-1-i)`), then re-centred on the
     current frame's landmark mean (`:90-107`)
  3. the frame is grayscaled, then a similarity transform — estimated with
     cv2.estimateAffinePartial2D(LMEDS) on the 8 stable points
     (28, 33, 36, 39, 42, 45, 48, 54) against the mean face — maps it onto
     a 256x256 canvas (`:147-217`)
  4. a patch of half-extent crop//2 centred on the warped mouth landmarks
     (48..67) is cut with the reference's bias OverflowError check and
     round+clip bounding box (`:38-52`).

Clips shorter than the smoothing window return None (`:80-84`).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

# cv2.estimateAffinePartial2D anchor points: nose bridge/tip, eye corners,
# mouth corners (`video_process.py:155`).
STABLE_POINTS: Tuple[int, ...] = (28, 33, 36, 39, 42, 45, 48, 54)
MOUTH_START, MOUTH_STOP = 48, 68


def interpolate_landmarks(landmarks: List[Optional[np.ndarray]]) -> Optional[List[np.ndarray]]:
    """Fill None frames by linear interpolation between detected neighbours;
    leading/trailing gaps copy the nearest detection (`:120-145`).
    Returns None when no frame has a detection."""
    idx = [i for i, lm in enumerate(landmarks) if lm is not None]
    if not idx:
        return None
    out: List[np.ndarray] = [None] * len(landmarks)  # type: ignore
    for i, lm in enumerate(landmarks):
        if lm is not None:
            out[i] = np.asarray(lm, np.float64)
    for a, b in zip(idx[:-1], idx[1:]):
        for i in range(a + 1, b):
            w = (i - a) / float(b - a)
            out[i] = (1 - w) * out[a] + w * out[b]
    for i in range(0, idx[0]):
        out[i] = out[idx[0]]
    for i in range(idx[-1] + 1, len(landmarks)):
        out[i] = out[idx[-1]]
    return out


def smoothed_frame_landmarks(
    landmarks: np.ndarray, frame_idx: int, window_margin: int = 12
) -> np.ndarray:
    """Symmetric shrinking-window mean around `frame_idx`, re-centred on the
    frame's own landmark centroid (`:93-107`)."""
    T = len(landmarks)
    m = min(window_margin // 2, frame_idx, T - 1 - frame_idx)
    sm = landmarks[frame_idx - m: frame_idx + m + 1].mean(axis=0)
    return sm + landmarks[frame_idx].mean(axis=0) - sm.mean(axis=0)


def estimate_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform src -> dst (2x3 matrix), the
    reference's cv2.estimateAffinePartial2D(LMEDS) (`:188-193`)."""
    import cv2

    m, _ = cv2.estimateAffinePartial2D(
        src.astype(np.float64), dst.astype(np.float64), method=cv2.LMEDS
    )
    if m is None:  # degenerate fallback: identity
        m = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    return m


def warp_frame(frame: np.ndarray, m: np.ndarray, size: int = 256) -> np.ndarray:
    """cv2.warpAffine with the reference's flags (`:205-212`)."""
    import cv2

    return cv2.warpAffine(
        frame, m, (size, size), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )


def apply_transform_to_landmarks(lms: np.ndarray, m: np.ndarray) -> np.ndarray:
    return lms @ m[:, :2].T + m[:, 2]


def cut_patch(
    img: np.ndarray,
    landmarks: np.ndarray,
    half_height: int,
    half_width: int,
    threshold: int = 5,
) -> np.ndarray:
    """Cut a patch centred on the landmark centroid with the reference's
    overflow check and round+clip bbox (`:38-52`)."""
    center_x, center_y = np.mean(landmarks, axis=0)
    if abs(center_y - img.shape[0] / 2) > half_height + threshold:
        raise OverflowError("too much bias in height")
    if abs(center_x - img.shape[1] / 2) > half_width + threshold:
        raise OverflowError("too much bias in width")
    y_min = int(round(np.clip(center_y - half_height, 0, img.shape[0])))
    y_max = int(round(np.clip(center_y + half_height, 0, img.shape[0])))
    x_min = int(round(np.clip(center_x - half_width, 0, img.shape[1])))
    x_max = int(round(np.clip(center_x + half_width, 0, img.shape[1])))
    return np.copy(img[y_min:y_max, x_min:x_max])


def extract_mouth_rois(
    frames: np.ndarray,  # (T, H, W, 3) uint8 RGB
    landmarks: List[Optional[np.ndarray]],  # per-frame (68, 2) or None
    mean_face: np.ndarray,  # (68, 2)
    crop_size: int = 96,
    canvas: int = 256,
    window_margin: int = 12,
    convert_gray: bool = True,
) -> Optional[np.ndarray]:
    """Full deterministic tail -> (T, crop, crop) uint8 grayscale mouth ROIs
    (or (T, crop, crop, 3) with convert_gray=False).

    Returns None when no frame has a detection or the clip is shorter than
    the smoothing window, matching `VideoProcess.__call__` (`:76-88`).
    """
    import cv2

    lms_list = interpolate_landmarks(landmarks)
    if lms_list is None or len(lms_list) < window_margin:
        return None
    lms = np.stack(lms_list)  # (T, 68, 2)
    stable_idx = list(STABLE_POINTS)
    # reference_size == target_size == (canvas, canvas) -> zero offset in
    # get_stable_reference (`:180-186`); keep the subtraction for generality.
    stable_ref = mean_face[stable_idx].astype(np.float64).copy()
    out = []
    for i, frame in enumerate(frames):
        sm = smoothed_frame_landmarks(lms, i, window_margin)
        if convert_gray:
            frame = cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY)
        m = estimate_similarity(sm[stable_idx], stable_ref)
        warped = warp_frame(frame, m, canvas)
        wlm = apply_transform_to_landmarks(sm, m)
        out.append(
            cut_patch(warped, wlm[MOUTH_START:MOUTH_STOP], crop_size // 2, crop_size // 2)
        )
    return np.array(out)
