"""Unit-discovery CLI: MFCC shapes, k-means convergence, label files."""

import os

import numpy as np

from omni_avsr_tpu.cli.cluster_units import kmeans_assign, kmeans_fit, mfcc, main
from omni_avsr_tpu.data.synthetic import _write_wav


def test_mfcc_shapes():
    audio = np.random.RandomState(0).randn(16000).astype(np.float32)
    f = mfcc(audio)
    assert f.shape[1] == 39  # 13 + deltas + delta-deltas
    assert f.shape[0] == 1 + (16000 - 400) // 160


def test_kmeans_separates_clusters():
    rng = np.random.RandomState(1)
    a = rng.randn(500, 4) + 10.0
    b = rng.randn(500, 4) - 10.0
    feats = np.concatenate([a, b]).astype(np.float32)
    C = kmeans_fit(feats, 2, iters=10)
    labels = kmeans_assign(feats, C)
    # the two blobs get distinct labels
    assert len(set(labels[:500])) == 1 and len(set(labels[500:])) == 1
    assert labels[0] != labels[-1]


def test_cluster_cli_end_to_end(tmp_path):
    root = tmp_path / "synth"
    root.mkdir()
    rng = np.random.RandomState(2)
    rows = []
    for i in range(3):
        _write_wav(str(root / f"c{i}.wav"), rng.randn(8000).astype(np.float32) * 0.1)
        rows.append(f"synth,c{i}.wav,12,0,hello")
    manifest = tmp_path / "m.csv"
    manifest.write_text("\n".join(rows) + "\n")
    out = tmp_path / "units"
    main(["--root-dir", str(tmp_path), "--manifest", str(manifest),
          "--out-dir", str(out), "--n-clusters", "4", "--iters", "5"])
    assert (out / "kmeans.npy").exists()
    labels = (out / "labels" / "c0.km").read_text().split()
    assert all(0 <= int(x) < 4 for x in labels)
