"""Synthetic AV corpus generator — the `create_dummy_data` idiom from the
fairseq test suite (SURVEY.md §4: `tests/utils.py:162`), adapted to AVSR:
tiny mp4+wav clips with known transcripts, so train/eval run end-to-end
offline through the real file loaders.
"""

from __future__ import annotations

import os
import wave
from typing import List, Optional, Tuple

import numpy as np

WORDS = (
    "the quick brown fox jumps over a lazy dog and runs far away "
    "hello world speech video model test data sample audio visual"
).split()


def _synth_audio(rng: np.random.RandomState, n: int, sr: int = 16000) -> np.ndarray:
    """Clip-distinct audio: a 3-sinusoid mixture (frequencies, amplitudes
    and phases drawn per clip) plus light noise — a distinct mel signature
    per clip."""
    t = np.arange(n, dtype=np.float64) / sr
    audio = np.zeros(n, dtype=np.float64)
    for _ in range(3):
        f = rng.uniform(150.0, 3800.0)
        a = rng.uniform(0.04, 0.12)
        audio += a * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    audio += rng.randn(n) * 0.01
    return audio.astype(np.float32)


def _synth_video(rng: np.random.RandomState, T: int, hw: int = 96) -> np.ndarray:
    """Clip-distinct video: a per-clip base colour + oriented spatial
    gradient, temporally modulated at a per-clip rate, plus a moving bright
    block (temporal structure for the 3D stem) and light pixel noise."""
    yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float64) / hw
    grad = rng.uniform(-1, 1) * xx + rng.uniform(-1, 1) * yy  # (H, W)
    base = rng.uniform(60, 200, size=3)  # RGB
    speed = rng.uniform(0.05, 0.45)
    phase = rng.uniform(0, 2 * np.pi)
    bs = 24  # block size
    bx = rng.randint(0, hw - bs)
    by = rng.randint(0, hw - bs)
    vx, vy = rng.randint(-3, 4), rng.randint(-3, 4)
    frames = np.empty((T, hw, hw, 3), dtype=np.uint8)
    for ti in range(T):
        mod = np.sin(2 * np.pi * speed * ti + phase)
        img = base[None, None, :] + 70.0 * mod * grad[..., None]
        x0 = int(bx + vx * ti) % (hw - bs)
        y0 = int(by + vy * ti) % (hw - bs)
        img[y0:y0 + bs, x0:x0 + bs, :] += 60.0
        img += rng.randn(hw, hw, 3) * 4.0
        frames[ti] = np.clip(img, 0, 255).astype(np.uint8)
    return frames


def _write_wav(path: str, audio: np.ndarray, sr: int = 16000) -> None:
    pcm = np.clip(audio * 32767.0, -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def _write_video(path: str, frames: np.ndarray) -> str:
    """Try mp4 via OpenCV; fall back to .npy (loader supports both)."""
    try:
        import cv2

        T, H, W, C = frames.shape
        vw = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (W, H)
        )
        if vw.isOpened():
            for f in frames:
                vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            vw.release()
            if os.path.getsize(path) > 0:
                return path
    except Exception:
        pass
    npy = path[:-4] + ".npy"
    np.save(npy, frames)
    return npy


def generate_corpus(
    out_dir: str,
    n_train: int = 8,
    n_val: int = 2,
    n_test: int = 2,
    min_frames: int = 24,
    max_frames: int = 60,
    min_words: int = 2,
    max_words: int = 5,
    seed: int = 0,
) -> Tuple[str, str, str]:
    """Writes clips + manifests; returns (train_csv, val_csv, test_csv)."""
    rng = np.random.RandomState(seed)
    ds = "synth"
    clip_dir = os.path.join(out_dir, ds)
    os.makedirs(clip_dir, exist_ok=True)

    def make_split(name: str, n: int) -> str:
        rows = []
        for i in range(n):
            T = int(rng.randint(min_frames, max_frames + 1))
            # STRUCTURED, clip-distinct content — not i.i.d. noise. Conv
            # towers average white noise toward identical statistics (the
            # spatial mean of 96x96 i.i.d. pixels is the same for every
            # clip; the log-mel of white noise is flat), which made the
            # clip->transcript link nearly unlearnable for the memorization
            # probes (r5, measured: CE plateaus at ln(n_clips)/tokens).
            # Sinusoid mixtures / oriented gradients give every clip a
            # strong tower-visible signature while still exercising the
            # full real pipeline.
            frames = _synth_video(rng, T)
            audio = _synth_audio(rng, T * 640)
            base = f"{name}_{i:04d}"
            video_path = _write_video(os.path.join(clip_dir, base + ".mp4"), frames)
            _write_wav(os.path.join(clip_dir, base + ".wav"), audio)
            n_words = int(rng.randint(min_words, max_words + 1))
            text = " ".join(rng.choice(WORDS) for _ in range(n_words))
            rel = os.path.basename(video_path)
            rows.append(f"{ds},{rel},{T},0,{text}")
        csv_path = os.path.join(out_dir, f"{name}.csv")
        with open(csv_path, "w") as f:
            f.write("\n".join(rows) + "\n")
        return csv_path

    return make_split("train", n_train), make_split("val", n_val), make_split("test", n_test)
