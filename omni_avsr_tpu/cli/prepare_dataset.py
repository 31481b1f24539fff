"""Batch dataset preparation: a directory tree of raw clips -> mouth-ROI
clips + wavs + bucketable manifests.

The framework's equivalent of the reference's LRS3/VoxCeleb preparation
pipelines (`av_hubert/avhubert/preparation/*.py` — landmark detection,
mouth alignment, manifest generation), collapsed into one parallel CLI on
the pluggable detector backend (omni_avsr_tpu/preprocess/).

  python -m omni_avsr_tpu.cli.prepare_dataset \
      --input-dir raw_clips/ --output-dir data/ --dataset-name lrs3 \
      --splits train:0.9 val:0.05 test:0.05
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import List, Optional, Tuple

import numpy as np


def find_clips(input_dir: str) -> List[str]:
    out = []
    for root, _, files in os.walk(input_dir):
        for f in sorted(files):
            if f.endswith((".mp4", ".npy")) and "preprocessed" not in f:
                out.append(os.path.join(root, f))
    return out


def read_transcript(clip_path: str) -> str:
    """LRS2/LRS3 convention: <clip>.txt with 'Text:  ...' line, or plain text."""
    txt = os.path.splitext(clip_path)[0] + ".txt"
    if not os.path.exists(txt):
        return ""
    with open(txt) as f:
        content = f.read()
    for line in content.splitlines():
        if line.lower().startswith("text:"):
            return line.split(":", 1)[1].strip()
    return content.strip().splitlines()[0] if content.strip() else ""


def process_clip(args_tuple: Tuple[str, str, str, Optional[str], str]) -> Optional[str]:
    clip, out_dir, dataset_name, mean_face_path, detector_name = args_tuple
    try:
        from ..cli.preprocess_video import extract_audio, write_video
        from ..data.dataset import load_video
        from ..preprocess.detector import build_detector
        from ..preprocess.mean_face import load_mean_face
        from ..preprocess.video_process import extract_mouth_rois

        frames = load_video(clip)
        detector = build_detector(detector_name)
        rois = extract_mouth_rois(
            frames, detector(frames), load_mean_face(mean_face_path)
        )
        if rois is None:
            raise ValueError("no usable landmarks / clip shorter than smooth window")
        base = os.path.splitext(os.path.basename(clip))[0]
        clip_out_dir = os.path.join(out_dir, dataset_name)
        os.makedirs(clip_out_dir, exist_ok=True)
        video_out = write_video(os.path.join(clip_out_dir, base + ".mp4"), rois)
        wav_src = os.path.splitext(clip)[0] + ".wav"
        wav_out = os.path.join(clip_out_dir, base + ".wav")
        if os.path.exists(wav_src):
            import shutil

            shutil.copyfile(wav_src, wav_out)
        else:
            extract_audio(clip, wav_out)
        text = read_transcript(clip)
        rel = os.path.basename(video_out)
        return f"{dataset_name},{rel},{len(rois)},0,{text}"
    except Exception as e:
        print(f"SKIP {clip}: {type(e).__name__}: {e}")
        return None


def main(argv=None):
    p = argparse.ArgumentParser("prepare_dataset")
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--dataset-name", default="lrs3")
    p.add_argument("--detector", default="auto", choices=["auto", "ibug", "center"])
    p.add_argument("--mean-face-path", default=None)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--splits", nargs="+", default=["train:0.9", "val:0.05", "test:0.05"])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    clips = find_clips(args.input_dir)
    print(f"found {len(clips)} clips")
    os.makedirs(args.output_dir, exist_ok=True)
    work = [(c, args.output_dir, args.dataset_name, args.mean_face_path, args.detector)
            for c in clips]
    with ThreadPoolExecutor(max_workers=args.num_workers) as pool:
        rows = [r for r in pool.map(process_clip, work) if r is not None]

    rng = np.random.RandomState(args.seed)
    order = rng.permutation(len(rows))
    splits = [(s.split(":")[0], float(s.split(":")[1])) for s in args.splits]
    start = 0
    for name, frac in splits:
        n = max(1, int(round(frac * len(rows)))) if start < len(rows) else 0
        part = [rows[i] for i in order[start:start + n]]
        start += n
        path = os.path.join(args.output_dir, f"{name}.csv")
        with open(path, "w") as f:
            f.write("\n".join(part) + ("\n" if part else ""))
        print(f"{path}: {len(part)} rows")


if __name__ == "__main__":
    main()
