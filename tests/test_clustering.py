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


def test_avhubert_feature_clustering_round_trip(tmp_path):
    """Iterations 2-5 of the reference pretraining loop
    (`clustering/dump_hubert_feature.py:32-134`): pretrain a tiny encoder ->
    dump its layer-N features -> k-means .km labels at 25 Hz -> feed them
    back into another pretrain run."""
    import pytest

    pytest.importorskip("jax")
    from omni_avsr_tpu.cli.pretrain_avhubert import main as pretrain_main
    from omni_avsr_tpu.train.checkpoint import latest_checkpoint

    exp1 = tmp_path / "it1"
    pretrain_main(["--synthetic", "3", "--max-steps", "2",
                   "--exp-dir", str(exp1)])
    ckpt = latest_checkpoint(str(exp1 / "checkpoints"))
    assert ckpt is not None
    assert (exp1 / "config.json").exists()

    data_dir = exp1 / "synthetic_data"
    units = tmp_path / "units2"
    main(["--root-dir", str(data_dir), "--manifest", str(data_dir / "train.csv"),
          "--out-dir", str(units), "--n-clusters", "4", "--iters", "3",
          "--features", "avhubert", "--layer", "2", "--ckpt", ckpt])
    assert (units / "label_rate.txt").read_text().strip() == "25"
    km_files = list((units / "labels").glob("*.km"))
    assert len(km_files) == 3
    # features are video-aligned: one unit per 25 Hz frame
    import csv

    lengths = {}
    for row in open(data_dir / "train.csv"):
        ds, rel, T, _, _ = row.strip().split(",", 4)
        lengths[rel.rsplit(".", 1)[0]] = int(T)
    for f in km_files:
        labels = f.read_text().split()
        assert len(labels) == lengths[f.stem]
        assert all(0 <= int(x) < 4 for x in labels)

    # iteration 2: consume the .km labels (25 Hz rate honoured)
    exp2 = tmp_path / "it2"
    pretrain_main(["--synthetic", "3", "--max-steps", "2",
                   "--exp-dir", str(exp2), "--labels-dir", str(units),
                   "--n-units", "4"])
    assert latest_checkpoint(str(exp2 / "checkpoints")) is not None


def test_layer_stop_semantics():
    """output_layer=N equals running only the first N layers, no top norm."""
    import jax
    import jax.numpy as jnp

    from omni_avsr_tpu.config import AVHubertConfig
    from omni_avsr_tpu.models.avhubert import avhubert_encode, init_avhubert

    cfg = AVHubertConfig(encoder_embed_dim=48, encoder_layers=3,
                         encoder_heads=4, encoder_ffn_dim=96,
                         audio_feat_dim=104, lora_rank_divisor=None)
    params = init_avhubert(jax.random.PRNGKey(0), cfg)
    video = jnp.asarray(
        np.random.RandomState(0).randn(1, 8, 88, 88, 1).astype(np.float32))
    full = avhubert_encode(params, cfg, video)
    l2 = avhubert_encode(params, cfg, video, output_layer=2)
    l3 = avhubert_encode(params, cfg, video, output_layer=3)
    assert l2.shape == full.shape
    # stopping early != full output; layer-3 (all layers, no top norm)
    # differs from full only by the final layer_norm
    assert not np.allclose(np.asarray(l2), np.asarray(l3))
    if cfg.layer_norm_first:
        assert not np.allclose(np.asarray(l3), np.asarray(full))
    # layer 0 = fused conv features (ret_conv)
    l0 = avhubert_encode(params, cfg, video, output_layer=0)
    assert l0.shape == full.shape


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
