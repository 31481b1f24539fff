"""Pluggable face-detection / landmark backends for preprocessing.

The reference uses RetinaFace (resnet50) + FAN 68-landmark models via the
ibug packages (`preprocessing_inference_example/detector.py:15-38`), picking
the largest face per frame. Those weights are not available in this image,
so the backend is a protocol:

  - `IbugLandmarksDetector`: the reference path; used when the ibug packages
    (+ weights) are installed.
  - `CenterFaceLandmarker`: offline fallback for corpora where the speaker
    is centered and frame-filling (LRS2/LRS3-style crops, synthetic data):
    projects the canonical mean face into a centered box. Lets the full
    pipeline run end-to-end without external weights.
"""

from __future__ import annotations

from typing import List, Optional, Protocol

import numpy as np

from .mean_face import canonical_mean_face


class LandmarksDetector(Protocol):
    def __call__(self, frames: np.ndarray) -> List[Optional[np.ndarray]]:
        """(T, H, W, 3) uint8 -> per-frame (68, 2) landmarks or None."""
        ...


def largest_face_index(faces: np.ndarray) -> int:
    """The reference's largest-face pick: width+height SUM, not area, first
    wins on ties (`preprocessing_inference_example/detector.py:33-37`)."""
    sizes = (faces[:, 2] - faces[:, 0]) + (faces[:, 3] - faces[:, 1])
    return int(np.argmax(sizes))


class IbugLandmarksDetector:
    """RetinaFace + FAN, largest-face pick per frame (reference behaviour).

    The reference runs FAN on every detected face then keeps the largest
    face's landmarks; running FAN only on the selected face yields the same
    output (per-face FAN results are independent) for one inference."""

    def __init__(self, device: str = "cpu"):
        from ibug.face_detection import RetinaFacePredictor
        from ibug.face_alignment import FANPredictor

        self.face_detector = RetinaFacePredictor(
            device=device, threshold=0.8,
            model=RetinaFacePredictor.get_model("resnet50"),
        )
        self.landmark_detector = FANPredictor(device=device, model=None)

    def __call__(self, frames: np.ndarray) -> List[Optional[np.ndarray]]:
        out: List[Optional[np.ndarray]] = []
        for frame in frames:
            faces = self.face_detector(frame, rgb=False)
            if len(faces) == 0:
                out.append(None)
                continue
            face = faces[largest_face_index(faces)]
            landmarks, _ = self.landmark_detector(frame, face[None], rgb=True)
            out.append(np.asarray(landmarks[0], np.float64))
        return out


class CenterFaceLandmarker:
    """Weights-free fallback: assume a centered face spanning `fill` of the
    frame and place the canonical mean face in that box."""

    def __init__(self, fill: float = 0.8):
        self.fill = fill
        self._canon = canonical_mean_face(256)

    def __call__(self, frames: np.ndarray) -> List[Optional[np.ndarray]]:
        T, H, W = frames.shape[:3]
        side = self.fill * min(H, W)
        scale = side / 256.0
        offset = np.array([(W - side) / 2.0, (H - side) / 2.0])
        lm = self._canon * scale + offset
        return [lm.copy() for _ in range(T)]


def build_detector(name: str = "auto", device: str = "cpu") -> LandmarksDetector:
    if name in ("auto", "ibug"):
        try:
            return IbugLandmarksDetector(device)
        except Exception:
            if name == "ibug":
                raise
    return CenterFaceLandmarker()
