"""On-device log-mel audio frontend (Whisper semantics).

The reference round-trips device->CPU->device EVERY step to run HF's numpy
WhisperFeatureExtractor (`modeling_OmniAVSR.py:528-537` — the single worst
data movement on its hot path, SURVEY.md §3). Here the whole frontend is
XLA on-device: reflect-pad framing, rFFT, mel filterbank matmul (MXU), log10
and Whisper's per-sample dynamic-range normalisation, all inside jit.

Numerics match HF WhisperFeatureExtractor exactly (see
tests/test_audio_frontend.py):
  - pad/truncate to 30 s (480000 samples) with zeros
  - periodic Hann window, n_fft 400, hop 160, centered with reflect padding
  - power spectrum |.|^2, 80 slaney-scale slaney-normalised mel filters
  - log10(max(mel, 1e-10)); clamp at (per-sample max - 8); (x + 4) / 4
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
N_MELS = 80
CHUNK_SAMPLES = 30 * SAMPLE_RATE  # 480000
NUM_FRAMES = CHUNK_SAMPLES // HOP  # 3000


def hertz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above."""
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    above = freq >= min_log_hertz
    mels = np.where(above, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hertz) * logstep, mels)
    return mels


def mel_to_hertz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    above = mels >= min_log_mel
    return np.where(above, min_log_hertz * np.exp(logstep * (mels - min_log_mel)), freq)


@functools.lru_cache(maxsize=4)
def mel_filter_bank(
    num_frequency_bins: int = N_FFT // 2 + 1,
    num_mel_filters: int = N_MELS,
    min_frequency: float = 0.0,
    max_frequency: float = 8000.0,
    sampling_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Triangular slaney-normalised mel filterbank, (num_freq_bins, n_mels)."""
    fft_freqs = np.linspace(0.0, sampling_rate / 2.0, num_frequency_bins)
    mel_min = hertz_to_mel_slaney(np.array(min_frequency))
    mel_max = hertz_to_mel_slaney(np.array(max_frequency))
    mel_pts = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    hz_pts = mel_to_hertz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[None, :] - fft_freqs[:, None]  # (F, M+2)
    down = -ramps[:, :-2] / fdiff[None, :-1]
    up = ramps[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # (F, M)
    # slaney normalisation: scale each filter to unit area
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    fb = fb * enorm[None, :]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=2)
def _hann_window(n: int = N_FFT) -> np.ndarray:
    """Periodic Hann (torch.hann_window / HF window_function default)."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(np.float32)


@functools.lru_cache(maxsize=2)
def _dft_matrices(n: int = N_FFT) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT as two (n_fft, n_fft//2+1) matmul operands.

    TPUs have no FFT unit — XLA lowers jnp.fft to a slow generic path —
    but n_fft=400 makes the direct DFT a tiny MXU matmul (~4 GFLOP for a
    30 s batch), exact to f32. rfft[k] = sum_n x[n] e^{-2 pi i k n / N}.
    """
    k = np.arange(n // 2 + 1)[None, :]
    t = np.arange(n)[:, None]
    ang = 2.0 * np.pi * t * k / n
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def log_mel_spectrogram(
    audio: jax.Array,  # (B, S) f32 waveform at 16 kHz
    audio_lengths: Optional[jax.Array] = None,  # (B,) valid samples, for zeroing pad
    num_frames: int = NUM_FRAMES,  # static: mel frames to produce
) -> jax.Array:
    """Whisper log-mel features, (B, num_frames, N_MELS) f32.

    Default `num_frames=3000` reproduces WhisperFeatureExtractor's pad-to-30s
    semantics exactly. A smaller STATIC `num_frames` (must cover the longest
    audio in the bucket) computes only that window — the kept frames are
    bit-identical to the 30 s computation (framing is local; the per-sample
    dynamic-range max comes from speech frames, not padding silence), it is
    only the downstream encoder's attention span that shrinks. Used by the
    opt-in `whisper_input_mode="bucket"` fast path (models/omni.py).
    """
    B, S = audio.shape
    chunk = num_frames * HOP
    audio = audio.astype(jnp.float32)
    if audio_lengths is not None:
        audio = jnp.where(jnp.arange(S)[None, :] < audio_lengths[:, None], audio, 0.0)
    if S < chunk:
        audio = jnp.pad(audio, ((0, 0), (0, chunk - S)))
    else:
        audio = audio[:, :chunk]

    # centered STFT: reflect-pad n_fft//2 both sides
    pad = N_FFT // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    # frame: (B, 1 + S/hop, n_fft) -> whisper drops the last frame
    n_frames_full = num_frames + 1
    idx = jnp.arange(n_frames_full)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = x[:, idx]  # (B, F+1, n_fft)
    window = jnp.asarray(_hann_window())
    windowed = frames * window
    cos_m, sin_m = (jnp.asarray(m) for m in _dft_matrices())
    re = jnp.einsum("bfn,nk->bfk", windowed, cos_m, preferred_element_type=jnp.float32)
    im = jnp.einsum("bfn,nk->bfk", windowed, sin_m, preferred_element_type=jnp.float32)
    power = jnp.square(re) + jnp.square(im)  # (B, F+1, 201)
    power = power[:, :-1]  # drop last frame (HF: stft[..., :-1])

    fb = jnp.asarray(mel_filter_bank())  # (201, 80)
    mel = jnp.einsum("bfk,km->bfm", power, fb)  # MXU matmul
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # per-sample dynamic range clamp: max over (frames, mels) of each item
    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    return (log_spec + 4.0) / 4.0


def whisper_token_len(audio_samples: jax.Array | int) -> jax.Array | int:
    """The reference trims Whisper outputs to max(len/16000*50, 25) tokens
    (`modeling_OmniAVSR.py:536-537`): 50 tokens/s, floor 25."""
    if isinstance(audio_samples, (int, np.integer)):
        return max(int(audio_samples / SAMPLE_RATE * 50), 25)
    return jnp.maximum((audio_samples * 50) // SAMPLE_RATE, 25)
