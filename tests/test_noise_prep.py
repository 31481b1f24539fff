"""Noise-bank construction + long-clip segmentation (reference preparation
pipeline semantics: musan_prepare.py / lrs3_noise.py / lrs3_prepare.py)."""

import os

import numpy as np
import pytest

from omni_avsr_tpu.preprocess.noise_prep import (
    SR,
    make_babble_wav,
    make_musan_babble,
    mix_wavs,
    read_wav_int16,
    split_clips,
    write_wav_int16,
)
from omni_avsr_tpu.cli.prepare_dataset import parse_word_intervals, segment_intervals


def _tone(path, seconds, freq, amp=8000):
    t = np.arange(int(seconds * SR)) / SR
    return write_wav_int16(path, (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16))


def test_mix_wavs_reference_semantics(tmp_path):
    a = _tone(str(tmp_path / "a.wav"), 2.0, 100)
    b = _tone(str(tmp_path / "b.wav"), 1.0, 200)
    mixed = mix_wavs([a, b])
    # trimmed to the SHORTEST source, mean of int16 streams
    assert len(mixed) == SR
    expect = (np.stack([read_wav_int16(a)[:SR], read_wav_int16(b)])
              .mean(axis=0).astype(np.int16))
    np.testing.assert_array_equal(mixed, expect)


def test_make_babble_wav_filters_short_clips(tmp_path):
    paths = [_tone(str(tmp_path / f"clip{i}.wav"), 16.0, 100 + i) for i in range(5)]
    paths += [_tone(str(tmp_path / "short.wav"), 2.0, 999)]
    out, n = make_babble_wav(paths, str(tmp_path / "noise" / "noise.wav"),
                             num_per_mixture=3, min_seconds=15.0, seed=0)
    assert n == 3 and os.path.exists(out)
    assert len(read_wav_int16(out)) == 16 * SR
    # manifests written (lrs3_noise.py:46-48)
    assert os.path.exists(str(tmp_path / "noise" / "valid.tsv"))
    assert open(str(tmp_path / "noise" / "test.tsv")).read().strip() == os.path.abspath(out)

    with pytest.raises(ValueError):
        make_babble_wav([str(tmp_path / "short.wav")], str(tmp_path / "x.wav"))


def test_musan_babble_speaker_heldout(tmp_path):
    # 10 speakers x 2 files, MUSAN naming speech-xx-SPK-NNNN.wav
    src = tmp_path / "speech"
    src.mkdir()
    for spk in range(10):
        for j in range(2):
            _tone(str(src / f"speech-en-{spk:03d}-{j:04d}.wav"), 1.0, 100 + spk)
    from omni_avsr_tpu.cli.make_noise import find_wavs

    wavs = find_wavs(str(src))
    outs = make_musan_babble(wavs, str(tmp_path / "bank"), num_per_mixture=4,
                             counts={"train": 3, "valid": 2, "test": 1}, seed=0)
    assert len(outs["train"]) == 3 and len(outs["valid"]) == 2 and len(outs["test"]) == 1
    # speaker splits are disjoint
    spk = {s: set(open(str(tmp_path / "bank" / f"spk.{s}")).read().split())
           for s in ("train", "valid", "test")}
    assert not (spk["train"] & spk["valid"]) and not (spk["train"] & spk["test"])
    assert len(spk["train"]) == 8  # 80% of 10


def test_split_clips(tmp_path):
    long = _tone(str(tmp_path / "long.wav"), 2.5, 100)
    short = _tone(str(tmp_path / "short.wav"), 0.5, 100)
    outs = split_clips([long, short], str(tmp_path / "out"), seconds=1.0)
    assert len(outs) == 3  # 2.5 s -> 3 pieces; short untouched
    assert len(read_wav_int16(outs[-1])) == int(0.5 * SR)


def test_make_noise_cli_babble(tmp_path, capsys):
    from omni_avsr_tpu.cli.make_noise import main

    for i in range(4):
        _tone(str(tmp_path / f"c{i}.wav"), 16.0, 120 + i)
    out = str(tmp_path / "noise.wav")
    main(["babble", "--input-dir", str(tmp_path), "--output", out,
          "--num-per-mixture", "2"])
    assert os.path.exists(out)
    assert "--noise-path" in capsys.readouterr().out


# --- segmentation (lrs3_prepare.py make_short_manifest port) ---

REF_TXT = """Text:  HELLO WORLD AGAIN NOW
Conf:  4

WORD START END ASDSCORE
HELLO 0.10 0.50 1.0
WORLD 0.60 1.00 1.0
AGAIN 9.00 16.20 1.0
NOW 16.30 17.00 1.0
"""


def test_parse_word_intervals(tmp_path):
    p = tmp_path / "clip.txt"
    p.write_text(REF_TXT)
    words = parse_word_intervals(str(p))
    assert words[0] == ("HELLO", 0.10, 0.50)
    assert len(words) == 4
    assert parse_word_intervals(str(tmp_path / "missing.txt")) == []


def test_segment_short_clip_stays_whole():
    words = [("A", 0.0, 1.0), ("B", 1.2, 2.0)]
    segs = segment_intervals(words, max_duration=15.0)
    assert segs == [(0.0, -1.0, "A B")]


def test_segment_long_clip_reference_boundaries():
    # gaps: B->C is 8.0s (> 0.4 -> split); others contiguous
    words = [("A", 0.0, 1.0), ("B", 1.1, 2.0), ("C", 10.0, 16.0), ("D", 16.1, 17.0)]
    segs = segment_intervals(words, max_duration=15.0, min_gap=0.4)
    assert len(segs) == 2
    s0, s1 = segs
    assert s0[0] == 0.0 and s1[1] == -1.0
    # boundary midway between sentence end (2.0) and next start (10.0)
    assert s0[1] == pytest.approx(6.0)
    assert s1[0] == pytest.approx(6.0)
    assert s0[2] == "A B" and s1[2] == "C D"


def test_segment_empty():
    assert segment_intervals([]) == []
