"""End-to-end CLI smoke tests on a synthetic corpus (fairseq
test_binaries idiom, SURVEY.md §4): train -> average -> WER sweep, offline."""

import os

import pytest


@pytest.mark.slow
def test_train_omni_synthetic(tmp_path):
    from omni_avsr_tpu.cli.train_omni import main

    exp = str(tmp_path / "omni")
    main([
        "--synthetic", "4", "--max-epochs", "1", "--exp-dir", exp,
        "--num-beams", "2", "--max-dec-tokens", "4",
        "--downsample-ratio-audio", "4", "--downsample-ratio-video", "2",
    ])
    # metrics written, checkpoints exist
    assert os.path.exists(os.path.join(exp, "omni", "metrics.jsonl"))
    ckpts = os.listdir(os.path.join(exp, "omni", "checkpoints"))
    assert any(c.startswith("step_") for c in ckpts)


@pytest.mark.slow
def test_train_llama_avsr_audio_synthetic(tmp_path):
    from omni_avsr_tpu.cli.train_llama_avsr import main

    exp = str(tmp_path / "baseline")
    main([
        "--synthetic", "3", "--max-epochs", "1", "--modality", "audio",
        "--exp-dir", exp, "--num-beams", "1", "--max-dec-tokens", "4",
        "--downsample-ratio-audio", "4", "--downsample-ratio-video", "2",
    ])
    assert os.path.exists(os.path.join(exp, "omni", "metrics.jsonl"))


@pytest.mark.slow
def test_train_omni_qwen_synthetic(tmp_path):
    """Qwen end-to-end through the driver (VERDICT r1 item 10): the synthetic
    tiny model switches to the qwen family (qkv bias, no BOS, tied embeddings)
    — exercises train + val + the auto-test decode grid with Qwen semantics
    (`Omni_AVSR/Qwen_LoRA.py:464-473`)."""
    from omni_avsr_tpu.cli.train_omni import main

    exp = str(tmp_path / "omni_qwen")
    main([
        "--synthetic", "3", "--max-epochs", "1", "--exp-dir", exp,
        "--llm-model", "Qwen/Qwen2.5-0.5B",
        "--num-beams", "2", "--max-dec-tokens", "4",
        "--downsample-ratio-audio", "4", "--downsample-ratio-video", "2",
    ])
    assert os.path.exists(os.path.join(exp, "omni", "metrics.jsonl"))
    ckpts = os.listdir(os.path.join(exp, "omni", "checkpoints"))
    assert any(c.startswith("step_") for c in ckpts)


@pytest.mark.slow
def test_train_omni_bucket_whisper_synthetic(tmp_path):
    """--whisper-input-mode bucket through the driver (the 1.64x train-step
    fast path): train + val + decode grid must run end-to-end."""
    from omni_avsr_tpu.cli.train_omni import main

    exp = str(tmp_path / "omni_bucket")
    main([
        "--synthetic", "3", "--max-epochs", "1", "--exp-dir", exp,
        "--whisper-input-mode", "bucket",
        "--num-beams", "2", "--max-dec-tokens", "4",
        "--downsample-ratio-audio", "4", "--downsample-ratio-video", "2",
    ])
    assert os.path.exists(os.path.join(exp, "omni", "metrics.jsonl"))


@pytest.mark.slow
def test_eval_omni_synthetic(tmp_path):
    from omni_avsr_tpu.cli.eval_omni import main

    exp = str(tmp_path / "eval")
    results = main([
        "--synthetic", "2", "--exp-dir", exp,
        "--num-beams", "2", "--max-dec-tokens", "4",
        "--test-specific-modality", "audio", "--test-specific-ratio", "4",
    ])
    assert list(results) == ["audio (a=4, v=None)"]
    assert results["audio (a=4, v=None)"] >= 0.0


def test_preprocess_cli(tmp_path):
    import numpy as np

    from omni_avsr_tpu.cli.preprocess_video import main
    from omni_avsr_tpu.data.synthetic import _write_video

    frames = np.random.RandomState(0).randint(0, 255, (12, 160, 160, 3), dtype=np.uint8)
    path = _write_video(str(tmp_path / "clip.mp4"), frames)
    main(["--path-to-input-video", path, "--transcription", "HELLO"])
    outs = os.listdir(tmp_path)
    assert any("preprocessed" in o for o in outs)
    assert "test_file.csv" in outs
    # ROI output is 96x96
    from omni_avsr_tpu.data.dataset import load_video

    roi_path = [o for o in outs if "preprocessed" in o][0]
    rois = load_video(str(tmp_path / roi_path))
    assert rois.shape[1:3] == (96, 96)


@pytest.mark.slow
def test_train_avhubert_s2s_audiovisual_synthetic(tmp_path, capsys):
    """Audiovisual AV-HuBERT fine-tune smoke: stacked-fbank audio branch
    through train step and test decode (torch-free path)."""
    from omni_avsr_tpu.cli.train_avhubert_s2s import main

    main([
        "--synthetic", "2", "--max-epochs", "1", "--modality", "audiovisual",
        "--exp-dir", str(tmp_path / "s2s_av"), "--max-dec-len", "6",
    ])
    assert "WER:" in capsys.readouterr().out

@pytest.mark.slow
def test_eval_omni_score_bleu(tmp_path, capsys):
    from omni_avsr_tpu.cli.eval_omni import main

    main([
        "--synthetic", "2", "--exp-dir", str(tmp_path / "bleu"),
        "--num-beams", "1", "--max-dec-tokens", "4",
        "--test-specific-modality", "audio", "--test-specific-ratio", "4",
        "--score-bleu", "true",
    ])
    assert "BLEU4" in capsys.readouterr().out
