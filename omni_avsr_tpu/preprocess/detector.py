"""Pluggable face-detection / landmark backends for preprocessing.

The reference uses RetinaFace (resnet50) + FAN 68-landmark models via the
ibug packages (`preprocessing_inference_example/detector.py:15-38`), picking
the largest face per frame. Those weights are not available in this image,
so the backend is a protocol:

  - `JaxLandmarksDetector`: self-contained JAX RetinaFace-ResNet50 + FAN
    (preprocess/retinaface.py, preprocess/fan.py) fed by torch weight FILES
    through convert/detector_torch.py — no ibug pip packages needed. The
    reference behaviour (threshold 0.8, largest-face pick, FAN landmarks)
    end-to-end.
  - `IbugLandmarksDetector`: the original ibug-package path, used when
    those packages (+ weights) are installed.
  - `CenterFaceLandmarker`: weights-free fallback for corpora where the
    speaker is centered and frame-filling (LRS2/LRS3-style crops, synthetic
    data): projects the canonical mean face into a centered box. Lets the
    full pipeline run end-to-end without external weights.
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


class JaxLandmarksDetector:
    """RetinaFace + FAN in JAX, largest-face pick per frame — the reference
    semantics (`preprocessing_inference_example/detector.py:24-38`) without
    the ibug package dependency.

    params_*: converted pytrees (convert/detector_torch.py), or paths to
    the public torch checkpoints (`Resnet50_Final.pth`, a 1adrianb-layout
    FAN .pth) which are loaded + converted on the fly."""

    def __init__(self, retinaface_params, fan_params, threshold: float = 0.8,
                 fan_modules: int = 2):
        from ..convert.detector_torch import convert_fan, convert_retinaface

        def load(p, conv, **kw):
            if isinstance(p, (str,)):
                import torch

                sd = torch.load(p, map_location="cpu")
                sd = sd.get("state_dict", sd)
                sd = {k.removeprefix("module."): v for k, v in sd.items()}
                return conv(sd, **kw)
            return p

        self.rf = load(retinaface_params, convert_retinaface)
        self.fan = load(fan_params, convert_fan, num_modules=fan_modules)
        self.threshold = threshold

    def __call__(self, frames: np.ndarray) -> List[Optional[np.ndarray]]:
        from .fan import fan_landmarks
        from .retinaface import detect_faces

        out: List[Optional[np.ndarray]] = []
        for frame in frames:  # frames arrive BGR (cv2), like the reference
            faces = detect_faces(self.rf, frame, threshold=self.threshold)
            if len(faces) == 0:
                out.append(None)
                continue
            face = faces[largest_face_index(faces)]
            if (not np.all(np.isfinite(face[:4]))) or face[2] <= face[0] \
                    or face[3] <= face[1]:
                # degenerate box (defensive — detect_faces already filters
                # these): treat as no detection; landmark interpolation
                # covers the gap (`video_process.py:120-145`)
                out.append(None)
                continue
            rgb = frame[..., ::-1]  # FAN consumes RGB (`detector.py:28`)
            out.append(fan_landmarks(self.fan, rgb, face))
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


def build_detector(
    name: str = "auto",
    device: str = "cpu",
    retinaface_weights: Optional[str] = None,
    fan_weights: Optional[str] = None,
) -> LandmarksDetector:
    if name in ("auto", "jax") and retinaface_weights and fan_weights:
        return JaxLandmarksDetector(retinaface_weights, fan_weights)
    if name == "jax":
        raise ValueError(
            "--detector jax needs --retinaface-weights and --fan-weights")
    if name in ("auto", "ibug"):
        try:
            return IbugLandmarksDetector(device)
        except Exception:
            if name == "ibug":
                raise
    return CenterFaceLandmarker()
