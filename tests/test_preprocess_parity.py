"""Preprocess-tail parity: extract_mouth_rois vs a direct oracle port of the
reference algorithm (`preprocessing_inference_example/video_process.py:38-217`).

The oracle below re-states the reference's per-frame loop semantics verbatim
in test-local code (smoothing window that shrinks symmetrically at clip
edges, re-centering on the current frame's landmark mean, cv2 LMEDS
similarity on the 8 stable points, grayscale-before-warp, round+clip mouth
patch with the bias OverflowError). The implementation under test is
structured differently (vectorised smoothing helper, modular warp/cut); the
assertion is max per-pixel diff == 0.
"""

import numpy as np
import pytest

from omni_avsr_tpu.preprocess.mean_face import canonical_mean_face
from omni_avsr_tpu.preprocess.video_process import (
    MOUTH_START,
    MOUTH_STOP,
    STABLE_POINTS,
    cut_patch,
    extract_mouth_rois,
    interpolate_landmarks,
    smoothed_frame_landmarks,
)

cv2 = pytest.importorskip("cv2")


# ------------------------------------------------------------------ oracle

def _oracle_interpolate(landmarks):
    """`VideoProcess.interpolate_landmarks` semantics (`:120-145`)."""
    landmarks = list(landmarks)
    valid = [i for i, lm in enumerate(landmarks) if lm is not None]
    if not valid:
        return None
    for k in range(1, len(valid)):
        a, b = valid[k - 1], valid[k]
        if b - a > 1:
            delta = landmarks[b] - landmarks[a]
            for j in range(1, b - a):
                landmarks[a + j] = landmarks[a] + j / float(b - a) * delta
    landmarks[: valid[0]] = [landmarks[valid[0]]] * valid[0]
    landmarks[valid[-1]:] = [landmarks[valid[-1]]] * (len(landmarks) - valid[-1])
    return landmarks


def _oracle_rois(video, landmarks, reference, window_margin=12, crop=96):
    """`VideoProcess.crop_patch` + `affine_transform` + `cut_patch`
    semantics (`:38-52, :90-217`), reference_size == target_size == 256."""
    landmarks = _oracle_interpolate(landmarks)
    if not landmarks or len(landmarks) < window_margin:
        return None
    stable_points = (28, 33, 36, 39, 42, 45, 48, 54)
    stable_reference = np.vstack([reference[x] for x in stable_points])
    sequence = []
    for frame_idx, frame in enumerate(video):
        margin = min(window_margin // 2, frame_idx, len(landmarks) - 1 - frame_idx)
        smoothed = np.mean(
            [landmarks[x] for x in range(frame_idx - margin, frame_idx + margin + 1)],
            axis=0,
        )
        smoothed += landmarks[frame_idx].mean(axis=0) - smoothed.mean(axis=0)
        gray = cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY)
        transform = cv2.estimateAffinePartial2D(
            np.vstack([smoothed[x] for x in stable_points]),
            stable_reference, method=cv2.LMEDS,
        )[0]
        warped = cv2.warpAffine(
            gray, transform, dsize=(256, 256), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=0,
        )
        tl = np.matmul(smoothed, transform[:, :2].T) + transform[:, 2]
        pts = tl[48:68]
        cx, cy = np.mean(pts, axis=0)
        if abs(cy - warped.shape[0] / 2) > crop // 2 + 5:
            raise OverflowError("too much bias in height")
        if abs(cx - warped.shape[1] / 2) > crop // 2 + 5:
            raise OverflowError("too much bias in width")
        y0 = int(round(np.clip(cy - crop // 2, 0, warped.shape[0])))
        y1 = int(round(np.clip(cy + crop // 2, 0, warped.shape[0])))
        x0 = int(round(np.clip(cx - crop // 2, 0, warped.shape[1])))
        x1 = int(round(np.clip(cx + crop // 2, 0, warped.shape[1])))
        sequence.append(np.copy(warped[y0:y1, x0:x1]))
    return np.array(sequence)


# --------------------------------------------------------------- fixtures

def _synthetic_clip(T=20, H=220, W=260, seed=0, gaps=(3, 4, 9), jitter=1.5):
    """Smooth-textured frames + mean-face-derived landmarks with per-frame
    jitter and a few undetected (None) frames."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for t in range(T):
        img = (
            127 + 90 * np.sin(xx / 17.0 + t * 0.3) * np.cos(yy / 23.0 - t * 0.2)
            + rng.randn(H, W) * 4.0
        )
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
    frames = np.repeat(np.stack(frames)[..., None], 3, axis=-1)
    base = canonical_mean_face(256) * 0.7 + np.array([40.0, 25.0])
    lms = []
    for t in range(T):
        if t in gaps:
            lms.append(None)
        else:
            lms.append(base + rng.randn(68, 2) * jitter)
    return frames, lms


# ------------------------------------------------------------------- tests

def test_roi_parity_vs_reference_oracle():
    frames, lms = _synthetic_clip()
    mean_face = canonical_mean_face(256)
    ours = extract_mouth_rois(frames, lms, mean_face)
    oracle = _oracle_rois(frames, [None if l is None else l.copy() for l in lms],
                          mean_face)
    assert ours is not None and oracle is not None
    assert ours.shape == oracle.shape == (20, 96, 96)
    assert int(np.abs(ours.astype(np.int32) - oracle.astype(np.int32)).max()) == 0


def test_color_mode_shape():
    frames, lms = _synthetic_clip(T=14)
    out = extract_mouth_rois(frames, lms, canonical_mean_face(256), convert_gray=False)
    assert out.shape == (14, 96, 96, 3)


def test_short_clip_returns_none():
    frames, lms = _synthetic_clip(T=8, gaps=())
    assert extract_mouth_rois(frames, lms, canonical_mean_face(256)) is None


def test_no_detection_returns_none():
    frames, _ = _synthetic_clip(T=16)
    assert extract_mouth_rois(frames, [None] * 16, canonical_mean_face(256)) is None


def test_interpolation_linear_and_edge_copy():
    a = np.zeros((68, 2))
    b = np.full((68, 2), 4.0)
    lms = [None, a, None, None, None, b, None]
    out = interpolate_landmarks(lms)
    assert np.allclose(out[0], a)           # leading copy
    assert np.allclose(out[2], 1.0)         # linear 1/4
    assert np.allclose(out[3], 2.0)
    assert np.allclose(out[4], 3.0)
    assert np.allclose(out[6], b)           # trailing copy


def test_smoothing_recentres_on_frame_mean():
    rng = np.random.RandomState(1)
    lms = rng.randn(20, 68, 2) * 3 + 100
    for i in (0, 3, 10, 19):
        sm = smoothed_frame_landmarks(lms, i, window_margin=12)
        # re-centred: smoothed centroid == current frame's centroid (:105-107)
        assert np.allclose(sm.mean(axis=0), lms[i].mean(axis=0))
    # edge frame: window shrinks to nothing -> equals the frame's landmarks
    assert np.allclose(smoothed_frame_landmarks(lms, 0, 12), lms[0])


def test_cut_patch_overflow():
    img = np.zeros((256, 256), np.uint8)
    far = np.full((20, 2), 250.0)  # centroid far from canvas centre
    with pytest.raises(OverflowError):
        cut_patch(img, far, 48, 48)


def test_stable_points_are_reference_set():
    assert STABLE_POINTS == (28, 33, 36, 39, 42, 45, 48, 54)
    assert (MOUTH_START, MOUTH_STOP) == (48, 68)


def test_largest_face_is_width_plus_height_sum():
    """The reference picks max (w + h), NOT max area, first wins on ties
    (`preprocessing_inference_example/detector.py:33-37`): a 10x30 face
    (sum 40, area 300) must beat a 19x19 face (sum 38, area 361)."""
    from omni_avsr_tpu.preprocess.detector import largest_face_index

    faces = np.array([[0.0, 0.0, 19.0, 19.0],   # area 361, sum 38
                      [0.0, 0.0, 10.0, 30.0]])  # area 300, sum 40
    assert largest_face_index(faces) == 1
    # tie -> first index (reference loop uses strict >)
    faces = np.array([[0.0, 0.0, 20.0, 20.0], [0.0, 0.0, 10.0, 30.0]])
    assert largest_face_index(faces) == 0
