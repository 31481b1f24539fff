"""Single-clip preprocessing CLI: raw mp4 -> mouth-ROI mp4 + wav + manifest.

Equivalent of `preprocessing_inference_example/preprocess_video.py:30-58`
(with its missing `import argparse/csv` bugs fixed): detect faces, extract
96x96 mouth ROIs, write `<name>_preprocessed.mp4`, `<name>.wav`, and a
one-row `test_file.csv` usable by eval drivers.

  python -m omni_avsr_tpu.cli.preprocess_video \
      --path-to-input-video clip.mp4 --transcription "HELLO WORLD"
"""

from __future__ import annotations

import argparse
import os
import subprocess
import wave

import numpy as np

from ..data.dataset import load_video
from ..preprocess.detector import build_detector
from ..preprocess.mean_face import load_mean_face
from ..preprocess.video_process import extract_mouth_rois


def extract_audio(video_path: str, wav_path: str) -> bool:
    """Extract 16 kHz mono wav (ffmpeg when present, else skip)."""
    try:
        subprocess.run(
            ["ffmpeg", "-y", "-i", video_path, "-ac", "1", "-ar", "16000",
             "-f", "wav", wav_path],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def write_video(path: str, frames: np.ndarray, fps: float = 25.0) -> str:
    """Write (T, H, W[, 3]) uint8 frames; grayscale ROIs (the reference
    pipeline's output) are replicated to 3 channels for the mp4 writer."""
    try:
        import cv2

        T, H, W = frames.shape[:3]
        gray = frames.ndim == 3
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
        if vw.isOpened():
            for f in frames:
                vw.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR) if gray
                         else cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            vw.release()
            if os.path.getsize(path) > 0:
                return path
    except Exception:
        pass
    npy = path[:-4] + ".npy"
    np.save(npy, frames)
    return npy


def main(argv=None):
    p = argparse.ArgumentParser("preprocess_video")
    p.add_argument("--path-to-input-video", required=True)
    p.add_argument("--transcription", default="")
    p.add_argument("--detector", default="auto",
                   choices=["auto", "jax", "ibug", "center"])
    p.add_argument("--retinaface-weights", default=None,
                   help="Resnet50_Final.pth (biubug6 layout) for --detector jax")
    p.add_argument("--fan-weights", default=None,
                   help="FAN .pth (1adrianb layout) for --detector jax")
    p.add_argument("--mean-face-path", default=None,
                   help="reference 20words_mean_face.npy for exact parity")
    p.add_argument("--out-dir", default=None)
    args = p.parse_args(argv)

    src = args.path_to_input_video
    out_dir = args.out_dir or os.path.dirname(os.path.abspath(src))
    os.makedirs(out_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(src))[0]

    frames = load_video(src)
    detector = build_detector(args.detector,
                              retinaface_weights=args.retinaface_weights,
                              fan_weights=args.fan_weights)
    landmarks = detector(frames)
    mean_face = load_mean_face(args.mean_face_path)
    rois = extract_mouth_rois(frames, landmarks, mean_face)
    if rois is None:
        raise SystemExit(
            "no usable landmarks (no detections, or clip shorter than the "
            "12-frame smoothing window) — cannot preprocess this clip"
        )

    video_out = write_video(os.path.join(out_dir, base + "_preprocessed.mp4"), rois)
    wav_out = os.path.join(out_dir, base + ".wav")
    has_audio = extract_audio(src, wav_out)

    csv_path = os.path.join(out_dir, "test_file.csv")
    rel = os.path.basename(video_out)
    with open(csv_path, "w") as f:
        f.write(f"{os.path.basename(out_dir)},{rel},{len(rois)},0,{args.transcription}\n")
    print(f"wrote {video_out}" + (f" + {wav_out}" if has_audio else " (no audio track extracted)"))
    print(f"manifest: {csv_path}")


if __name__ == "__main__":
    main()
