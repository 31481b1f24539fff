"""Audio tower parity vs HF transformers (torch CPU): log-mel frontend and
Whisper encoder activations at identical weights — SURVEY.md §4(a)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.config import WhisperEncoderConfig
from omni_avsr_tpu.models.whisper import init_whisper_encoder, whisper_encode
from omni_avsr_tpu.ops.audio_frontend import (
    log_mel_spectrogram,
    mel_filter_bank,
    whisper_token_len,
)

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def test_mel_filterbank_matches_hf():
    from transformers.audio_utils import mel_filter_bank as hf_mel

    ours = mel_filter_bank()
    theirs = hf_mel(
        num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney",
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_log_mel_matches_whisper_feature_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()  # defaults = whisper 80-mel config
    rng = np.random.RandomState(0)
    # two lengths: short (2 s) and long-ish (7.3 s), batch of 2
    for secs in (2.0, 7.3):
        n = int(16000 * secs)
        audio = rng.randn(2, n).astype(np.float32) * 0.1
        ref = fe(
            [audio[0], audio[1]], sampling_rate=16000, return_tensors="np",
            padding="max_length",
        ).input_features  # (2, 80, 3000)
        ours = np.asarray(log_mel_spectrogram(jnp.asarray(audio)))  # (2, 3000, 80)
        np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=2e-4, rtol=1e-4)


def test_token_len_rule():
    # max(int(len/16000*50), 25) (`modeling_OmniAVSR.py:537`)
    assert whisper_token_len(16000) == 50
    assert whisper_token_len(4000) == 25
    assert whisper_token_len(160000) == 500


def test_whisper_encoder_parity_random_weights():
    """Tiny random HF WhisperEncoder -> convert -> compare activations."""
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    from omni_avsr_tpu.convert.whisper_torch import convert_whisper_encoder

    hf_cfg = WhisperConfig(
        num_mel_bins=80, d_model=64, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=128, max_source_positions=1500, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0,
    )
    torch.manual_seed(0)
    enc = WhisperEncoder(hf_cfg).eval()

    cfg = WhisperEncoderConfig(
        num_mel_bins=80, hidden_size=64, num_layers=2, num_heads=4, ffn_dim=128
    )
    params = convert_whisper_encoder(enc.state_dict(), cfg, dtype=jnp.float32)

    mel = np.random.RandomState(1).randn(2, 80, 3000).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(whisper_encode(params, cfg, jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_whisper_encode_shapes():
    cfg = WhisperEncoderConfig(hidden_size=64, num_layers=2, num_heads=4, ffn_dim=128)
    params = init_whisper_encoder(jax.random.PRNGKey(0), cfg)
    mel = jnp.zeros((1, 3000, 80), jnp.float32)
    out = whisper_encode(params, cfg, mel)
    assert out.shape == (1, 1500, 64)


def test_log_mel_bucketed_window_bit_equal():
    """num_frames < 3000 must reproduce the SAME kept mel frames as the
    reference-exact 30 s computation (framing is local; the dynamic-range
    max comes from speech, not padding silence) — the guarantee behind
    whisper_input_mode='bucket' (config.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from omni_avsr_tpu.ops.audio_frontend import log_mel_spectrogram

    rng = np.random.RandomState(0)
    S = 4 * 16000  # 4 s of audio
    audio = jnp.asarray(rng.randn(2, S).astype(np.float32) * 0.1)
    lens = jnp.array([S, S - 5000], jnp.int32)

    full = log_mel_spectrogram(audio, lens)             # (B, 3000, 80)
    short = log_mel_spectrogram(audio, lens, num_frames=500)  # 5 s window
    np.testing.assert_allclose(np.asarray(short), np.asarray(full[:, :500]),
                               rtol=1e-6, atol=1e-6)


def test_whisper_bucket_input_mode_runs():
    """encode_audio with whisper_input_mode='bucket' produces the same
    token count and finite values (numerics differ from pad30s only via the
    encoder's attention span)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tests.test_omni import tiny_omni

    model = tiny_omni()
    model_b = type(model)(dataclasses.replace(model.cfg, whisper_input_mode="bucket"),
                          model.tok)
    params = model.init_params(jax.random.PRNGKey(0), frozen_dtype=jnp.float32)
    rng = np.random.RandomState(1)
    audio = jnp.asarray(rng.randn(2, 50 * 320).astype(np.float32) * 0.1)
    lens = jnp.full((2,), 50 * 320, jnp.int32)
    a = model.encode_audio(params, audio, lens, 4, 50)
    b = model_b.encode_audio(params, audio, lens, 4, 50)
    assert a.shape == b.shape
    assert bool(jnp.all(jnp.isfinite(b.astype(jnp.float32))))
