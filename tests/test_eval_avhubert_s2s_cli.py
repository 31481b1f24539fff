"""End-to-end smoke of the AV-HuBERT seq2seq eval CLI: synthetic fairseq
checkpoint -> converter -> encoder -> shared-cross beam decode -> WER."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _s2s_state_dict(D=64, layers=2, heads=4, ffn=128, dec_D=32, dec_layers=2,
                    dec_ffn=64, vocab=24, audio_feat=104):
    """Tiny AVHubertSeq2Seq state dict in fairseq key layout
    (`hubert_asr.py` encoder.w2v_model.* + decoder.*)."""
    torch.manual_seed(0)
    sd = {}
    enc = "encoder.w2v_model"
    root = f"{enc}.feature_extractor_video.resnet"
    sd[f"{root}.frontend3D.0.weight"] = torch.randn(64, 1, 5, 7, 7) * 0.05
    sd[f"{root}.frontend3D.1.weight"] = torch.ones(64)
    sd[f"{root}.frontend3D.1.bias"] = torch.zeros(64)
    sd[f"{root}.frontend3D.1.running_mean"] = torch.zeros(64)
    sd[f"{root}.frontend3D.1.running_var"] = torch.ones(64)
    sd[f"{root}.frontend3D.2.weight"] = torch.full((64,), 0.25)
    chans = [(64, 64), (64, 128), (128, 256), (256, 512)]
    for li, (cin, cout) in enumerate(chans, start=1):
        for b in range(2):
            p = f"{root}.trunk.layer{li}.{b}"
            c_in = cin if b == 0 else cout
            sd[f"{p}.conv1.weight"] = torch.randn(cout, c_in, 3, 3) * 0.05
            sd[f"{p}.conv2.weight"] = torch.randn(cout, cout, 3, 3) * 0.05
            for bn in ("bn1", "bn2"):
                sd[f"{p}.{bn}.weight"] = torch.ones(cout)
                sd[f"{p}.{bn}.bias"] = torch.zeros(cout)
                sd[f"{p}.{bn}.running_mean"] = torch.zeros(cout)
                sd[f"{p}.{bn}.running_var"] = torch.ones(cout)
            sd[f"{p}.relu1.weight"] = torch.full((cout,), 0.25)
            sd[f"{p}.relu2.weight"] = torch.full((cout,), 0.25)
            if b == 0 and cin != cout:
                sd[f"{p}.downsample.0.weight"] = torch.randn(cout, cin, 1, 1) * 0.05
                sd[f"{p}.downsample.1.weight"] = torch.ones(cout)
                sd[f"{p}.downsample.1.bias"] = torch.zeros(cout)
                sd[f"{p}.downsample.1.running_mean"] = torch.zeros(cout)
                sd[f"{p}.downsample.1.running_var"] = torch.ones(cout)
    sd[f"{enc}.feature_extractor_video.proj.weight"] = torch.randn(D, 512) * 0.05
    sd[f"{enc}.feature_extractor_video.proj.bias"] = torch.zeros(D)
    sd[f"{enc}.feature_extractor_audio.proj.weight"] = torch.randn(D, audio_feat) * 0.05
    sd[f"{enc}.feature_extractor_audio.proj.bias"] = torch.zeros(D)
    sd[f"{enc}.layer_norm.weight"] = torch.ones(2 * D)
    sd[f"{enc}.layer_norm.bias"] = torch.zeros(2 * D)
    sd[f"{enc}.post_extract_proj.weight"] = torch.randn(D, 2 * D) * 0.05
    sd[f"{enc}.post_extract_proj.bias"] = torch.zeros(D)
    sd[f"{enc}.encoder.pos_conv.0.bias"] = torch.zeros(D)
    sd[f"{enc}.encoder.pos_conv.0.weight_g"] = torch.ones(1, 1, 128)
    sd[f"{enc}.encoder.pos_conv.0.weight_v"] = torch.randn(D, D // 16, 128) * 0.05
    for i in range(layers):
        p = f"{enc}.encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = torch.randn(D, D) * 0.05
            sd[f"{p}.self_attn.{proj}.bias"] = torch.zeros(D)
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            sd[f"{p}.{ln}.weight"] = torch.ones(D)
            sd[f"{p}.{ln}.bias"] = torch.zeros(D)
        sd[f"{p}.fc1.weight"] = torch.randn(ffn, D) * 0.05
        sd[f"{p}.fc1.bias"] = torch.zeros(ffn)
        sd[f"{p}.fc2.weight"] = torch.randn(D, ffn) * 0.05
        sd[f"{p}.fc2.bias"] = torch.zeros(D)
    sd[f"{enc}.encoder.layer_norm.weight"] = torch.ones(D)
    sd[f"{enc}.encoder.layer_norm.bias"] = torch.zeros(D)

    dec = "decoder"
    sd[f"{dec}.embed_tokens.weight"] = torch.randn(vocab, dec_D) * 0.05
    for i in range(dec_layers):
        p = f"{dec}.layers.{i}"
        for attn, kvdim in (("self_attn", dec_D), ("encoder_attn", D)):
            sd[f"{p}.{attn}.q_proj.weight"] = torch.randn(dec_D, dec_D) * 0.05
            sd[f"{p}.{attn}.q_proj.bias"] = torch.zeros(dec_D)
            sd[f"{p}.{attn}.k_proj.weight"] = torch.randn(dec_D, kvdim) * 0.05
            sd[f"{p}.{attn}.k_proj.bias"] = torch.zeros(dec_D)
            sd[f"{p}.{attn}.v_proj.weight"] = torch.randn(dec_D, kvdim) * 0.05
            sd[f"{p}.{attn}.v_proj.bias"] = torch.zeros(dec_D)
            sd[f"{p}.{attn}.out_proj.weight"] = torch.randn(dec_D, dec_D) * 0.05
            sd[f"{p}.{attn}.out_proj.bias"] = torch.zeros(dec_D)
        for ln in ("self_attn_layer_norm", "encoder_attn_layer_norm",
                   "final_layer_norm"):
            sd[f"{p}.{ln}.weight"] = torch.ones(dec_D)
            sd[f"{p}.{ln}.bias"] = torch.zeros(dec_D)
        sd[f"{p}.fc1.weight"] = torch.randn(dec_ffn, dec_D) * 0.05
        sd[f"{p}.fc1.bias"] = torch.zeros(dec_ffn)
        sd[f"{p}.fc2.weight"] = torch.randn(dec_D, dec_ffn) * 0.05
        sd[f"{p}.fc2.bias"] = torch.zeros(dec_D)
    return sd


def test_stacked_fbank_shapes():
    from omni_avsr_tpu.data.audio_features import (
        batch_stacked_fbank,
        logfbank,
        stacked_fbank,
        stacker,
    )

    audio = np.random.RandomState(0).randn(24 * 640).astype(np.float32)
    # psf round-up framing: T*640 samples -> 4T-1 frames @ 100 Hz, so the
    # zero-padding stacker returns exactly T video-aligned frames
    base = logfbank(audio)
    assert base.shape == (4 * 24 - 1, 26)
    assert stacker(base).shape == (24, 104)
    f = stacked_fbank(audio, 24)
    assert f.shape == (24, 104) and f.dtype == np.float32
    # per-frame layer_norm: each populated frame is standardized
    assert np.allclose(f.mean(axis=1), 0.0, atol=1e-4)
    assert np.allclose(f.var(axis=1), 1.0, atol=1e-2)
    batch = np.stack([audio, audio * 0.5])
    fb = batch_stacked_fbank(batch, np.array([24 * 640, 20 * 640]), 24)
    assert fb.shape == (2, 24, 104)
    # the shorter waveform populates only its own 20 frames
    assert np.allclose(fb[1, 20:], 0.0)
    assert not np.allclose(fb[1, 19], 0.0)


def test_stacker_zero_pads_remainder():
    from omni_avsr_tpu.data.audio_features import stacker

    feats = np.arange(10, dtype=np.float32).reshape(5, 2)
    out = stacker(feats, 4)
    assert out.shape == (2, 8)
    # the 5th frame survives in the second stacked row, remainder zeros
    assert out[1, :2].tolist() == [8.0, 9.0]
    assert np.allclose(out[1, 2:], 0.0)


@pytest.mark.slow
@pytest.mark.parametrize("modality", ["video", "audiovisual"])
def test_eval_avhubert_s2s_cli(tmp_path, capsys, modality):
    from omni_avsr_tpu.cli.eval_avhubert_s2s import main
    from omni_avsr_tpu.data.synthetic import WORDS, generate_corpus

    _, _, test_csv = generate_corpus(str(tmp_path), n_train=1, n_val=1, n_test=2,
                                     min_frames=24, max_frames=32)
    ckpt = str(tmp_path / "s2s.pt")
    vocab = 4 + len(set(WORDS))  # specials + dictionary entries
    torch.save({"model": _s2s_state_dict(vocab=vocab)}, ckpt)
    dict_path = str(tmp_path / "dict.wrd.txt")
    with open(dict_path, "w") as f:
        for w in sorted(set(WORDS)):
            f.write(f"{w.upper()} 1\n")

    main([
        "--ckpt", ckpt, "--dict", dict_path,
        "--root-dir", str(tmp_path), "--test-file", test_csv,
        "--modality", modality, "--num-beams", "3", "--max-len", "6",
        "--encoder-layers", "2", "--encoder-dim", "64",
        "--encoder-heads", "4", "--encoder-ffn-dim", "128",
        "--decoder-layers", "2", "--decoder-embed-dim", "32",
        "--decoder-ffn-dim", "64", "--decoder-heads", "4",
    ])
    out = capsys.readouterr().out
    assert "WER:" in out and "HYP" in out

