"""Dry-run of the real-checkpoint parity campaign (VERDICT r2 next #8):
`cli/verify_parity.py --modes bf16,int8,bucket --golden-clip ...` must run
green end-to-end on the synthetic corpus so the command is zero-thought the
day real checkpoints/corpora are reachable."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_verify_parity_modes_and_golden_clip(tmp_path):
    from omni_avsr_tpu.cli.verify_parity import main
    from omni_avsr_tpu.data.synthetic import _write_video, _write_wav

    # a raw "golden clip": mp4 (or npy fallback) + sibling wav
    clip_dir = tmp_path / "clips"
    clip_dir.mkdir()
    rng = np.random.RandomState(0)
    clip = _write_video(str(clip_dir / "golden.mp4"),
                        rng.randint(0, 255, (16, 160, 160, 3), dtype=np.uint8))
    _write_wav(str(clip_dir / "golden.wav"),
               (rng.randn(16 * 640) * 0.1).astype(np.float32))

    out_json = str(tmp_path / "parity.json")
    rc = main([
        "--modes", "bf16,int8,bucket",
        "--golden-clip", clip,
        "--output-json", out_json,
        # in-process run: skip the (default) reference profile so the env
        # pins don't leak into other tests in this pytest process — the
        # profile itself is covered by tests/test_profile.py
        "--profile", "none",
        # everything after this goes to eval_omni (random tiny weights)
        "--synthetic", "2", "--exp-dir", str(tmp_path / "eval"),
        "--num-beams", "2", "--max-dec-tokens", "4",
        "--test-specific-modality", "audio", "--test-specific-ratio", "4",
    ])
    # random weights cannot PASS the WER diff; the campaign mechanics must
    # still complete and write the full report
    assert rc == 1
    report = json.load(open(out_json))
    assert report["modes"] == ["bf16", "int8", "bucket"]
    row = next(r for r in report["rows"] if r["setting"] == "audio (a=4, v=None)")
    assert row["ours"] is not None
    assert "int8" in row and "bucket" in row
    assert "int8_vs_bf16" in row and "bucket_vs_bf16" in row
    g = report["golden_clip"]
    assert g["modality"] == "audiovisual"  # sibling wav picked up
    assert set(g["transcripts"]) == {"bf16", "int8", "bucket"}
    assert all(isinstance(v, str) for v in g["transcripts"].values())
