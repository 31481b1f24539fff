"""Batch dataset preparation CLI: raw clips tree -> ROI clips + manifests."""

import os

import numpy as np


def test_prepare_dataset_end_to_end(tmp_path):
    from omni_avsr_tpu.cli.prepare_dataset import main
    from omni_avsr_tpu.data.dataset import AVDataset, load_video
    from omni_avsr_tpu.data.synthetic import _write_video, _write_wav

    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        # >= 12 frames: the reference tail skips clips shorter than the
        # smoothing window (video_process.py:80-84)
        frames = rng.randint(0, 255, (14 + i, 120, 120, 3), dtype=np.uint8)
        path = _write_video(str(raw / f"clip{i}.mp4"), frames)
        _write_wav(str(raw / f"clip{i}.wav"), rng.randn((14 + i) * 640).astype(np.float32) * 0.1)
        with open(str(raw / f"clip{i}.txt"), "w") as f:
            f.write(f"Text:  hello world {i}\n")

    out = tmp_path / "data"
    main(["--input-dir", str(raw), "--output-dir", str(out),
          "--dataset-name", "synthp", "--num-workers", "2",
          "--splits", "train:0.5", "test:0.5"])

    train_csv = out / "train.csv"
    test_csv = out / "test.csv"
    assert train_csv.exists() and test_csv.exists()
    n_rows = sum(1 for _ in open(train_csv)) + sum(1 for _ in open(test_csv))
    assert n_rows == 4
    # transcripts parsed from the Text: line
    assert "hello world" in open(train_csv).read()

    # the produced manifest is loadable by the real dataset class
    ds = AVDataset(str(out), str(train_csv), "audiovisual")
    sample = ds[0]
    assert sample["video"].shape[1:3] == (96, 96)
    assert len(sample["audio"]) == len(sample["video"]) * 640
