"""HuBERT unit discovery: MFCC feature dump + k-means labelling.

Framework equivalent of `av_hubert/avhubert/clustering/*.py` (MFCC/feature
dump, k-means training, label generation for masked-prediction targets):

  python -m omni_avsr_tpu.cli.cluster_units \
      --root-dir data/ --manifest train.csv --out-dir units/ --n-clusters 100

Produces `<out>/kmeans.npy` (centroids) and `<out>/labels/<clip>.km`
(space-separated unit ids per 10 ms frame), consumable as pre-training
targets (models/avhubert_pretrain.py).
"""

from __future__ import annotations

import argparse
import os
from typing import List, Tuple

import numpy as np

from ..data.dataset import load_audio, load_manifest
from ..ops.audio_frontend import mel_filter_bank


def mfcc(audio: np.ndarray, sr: int = 16000, n_mfcc: int = 13,
         with_deltas: bool = True) -> np.ndarray:
    """(S,) -> (T, 13|39) MFCCs at 25 ms / 10 ms with optional deltas."""
    n_fft, hop = 400, 160
    if len(audio) < n_fft:
        audio = np.pad(audio, (0, n_fft - len(audio)))
    n_frames = 1 + (len(audio) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    frames = audio[idx] * window
    power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    fb = mel_filter_bank()  # (201, 80)
    mel = np.maximum(power @ fb, 1e-10)
    logmel = np.log(mel)
    # DCT-II orthonormal, first n_mfcc coefficients
    M = logmel.shape[1]
    k = np.arange(n_mfcc)[:, None]
    n = np.arange(M)[None, :]
    dct = np.cos(np.pi * k * (2 * n + 1) / (2 * M)) * np.sqrt(2.0 / M)
    dct[0] /= np.sqrt(2.0)
    feats = logmel @ dct.T  # (T, 13)
    if with_deltas:
        d1 = np.gradient(feats, axis=0)
        d2 = np.gradient(d1, axis=0)
        feats = np.concatenate([feats, d1, d2], axis=1)
    return feats.astype(np.float32)


def kmeans_fit(feats: np.ndarray, k: int, iters: int = 20, seed: int = 0,
               batch: int = 65536) -> np.ndarray:
    """Mini-batch k-means with k-means++ init. Returns (k, D) centroids."""
    rng = np.random.RandomState(seed)
    n = len(feats)
    # k-means++ seeding on a subsample
    sub = feats[rng.choice(n, min(n, 20000), replace=False)]
    centroids = [sub[rng.randint(len(sub))]]
    for _ in range(1, k):
        d2 = np.min(
            ((sub[:, None] - np.stack(centroids)[None]) ** 2).sum(-1), axis=1
        )
        probs = d2 / max(d2.sum(), 1e-12)
        centroids.append(sub[rng.choice(len(sub), p=probs)])
    C = np.stack(centroids)
    counts = np.zeros(k)
    for it in range(iters):
        bi = rng.choice(n, min(batch, n), replace=False)
        x = feats[bi]
        assign = np.argmin(
            (x ** 2).sum(1)[:, None] - 2 * x @ C.T + (C ** 2).sum(1)[None], axis=1
        )
        for j in np.unique(assign):
            sel = x[assign == j]
            counts[j] += len(sel)
            lr = len(sel) / counts[j]
            C[j] = (1 - lr) * C[j] + lr * sel.mean(axis=0)
    return C.astype(np.float32)


def kmeans_assign(feats: np.ndarray, C: np.ndarray) -> np.ndarray:
    return np.argmin(
        (feats ** 2).sum(1)[:, None] - 2 * feats @ C.T + (C ** 2).sum(1)[None],
        axis=1,
    ).astype(np.int32)


def main(argv=None):
    p = argparse.ArgumentParser("cluster_units")
    p.add_argument("--root-dir", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--n-clusters", type=int, default=100)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--max-feats", type=int, default=2_000_000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    entries = load_manifest(args.manifest)
    os.makedirs(os.path.join(args.out_dir, "labels"), exist_ok=True)

    all_feats: List[np.ndarray] = []
    per_clip: List[Tuple[str, np.ndarray]] = []
    total = 0
    for e in entries:
        audio = load_audio(e.path(args.root_dir))
        f = mfcc(audio)
        per_clip.append((os.path.splitext(os.path.basename(e.rel_path))[0], f))
        if total < args.max_feats:
            all_feats.append(f)
            total += len(f)
    feats = np.concatenate(all_feats)[: args.max_feats]
    print(f"fitting k-means: {len(feats)} frames, k={args.n_clusters}")
    C = kmeans_fit(feats, args.n_clusters, args.iters, args.seed)
    np.save(os.path.join(args.out_dir, "kmeans.npy"), C)

    for name, f in per_clip:
        labels = kmeans_assign(f, C)
        with open(os.path.join(args.out_dir, "labels", name + ".km"), "w") as out:
            out.write(" ".join(map(str, labels.tolist())))
    print(f"wrote {len(per_clip)} label files to {args.out_dir}/labels")


if __name__ == "__main__":
    main()
