"""Host-side stacked filterbank features for the AV-HuBERT audio branch.

The reference feeds AV-HuBERT's audio `SubModel` 26-dim log filterbanks at
100 Hz stacked 4x feature-wise -> 104-d frames at 25 Hz, time-aligned 1:1
with the video frames (`av_hubert/avhubert/hubert_dataset.py:294-303`
`stacker(logfbank(wav), 4)`; consumed by
`hubert.py:318-332` SubModel via `feature_extractor_audio`).

Simplified here: the 26-dim base features come from the framework's
MFCC frontend (cepstral instead of raw log-mel — adequate for synthetic
training and for driving the CLIs; converted real checkpoints receive the
same 104-d layout and time base).
"""

from __future__ import annotations

import numpy as np

STACK = 4  # 100 Hz feature rate -> 25 Hz video rate
N_FEAT = 26


def stacked_fbank(audio: np.ndarray, T: int) -> np.ndarray:
    """(S,) waveform @ 16 kHz -> (T, 104) stacked features @ 25 Hz,
    zero-padded / truncated to exactly T video-aligned frames."""
    from ..cli.cluster_units import mfcc

    f = mfcc(audio, n_mfcc=N_FEAT, with_deltas=False)  # (t, 26) @ 100 Hz
    t4 = (len(f) // STACK) * STACK
    stacked = f[:t4].reshape(-1, STACK * N_FEAT)
    out = np.zeros((T, STACK * N_FEAT), np.float32)
    n = min(T, len(stacked))
    out[:n] = stacked[:n]
    return out


def batch_stacked_fbank(audio: np.ndarray, audio_len: np.ndarray, T: int) -> np.ndarray:
    """(B, S) padded waveforms + (B,) sample counts -> (B, T, 104)."""
    return np.stack([
        stacked_fbank(np.asarray(audio[i][: int(audio_len[i])]), T)
        for i in range(len(audio))
    ])
