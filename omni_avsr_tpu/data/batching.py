"""Frame-budget bucketing and static-shape collation.

Re-imagines the reference's dynamic batching for XLA:
  - `CustomBucketDataset` (`datamodule/data_module.py:82-144`): bucketize
    lengths into num_buckets, sort within bucket, pack until max_frames.
    Re-implemented host-side (a C++ fast path backs `bucket_batches` when
    the native lib is built — `native/`); we also FIX the reference's dead
    shuffle path (`random` unimported at `data_module.py:126`).
  - Collation pads every batch to *shape buckets* (video frames rounded up
    to a multiple, audio = frames * 640, tokens to a multiple of 8) so the
    number of distinct compiled shapes stays small — the XLA replacement
    for `pad_sequence`'s per-batch dynamic shapes.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.audio_frontend import whisper_token_len
from .tokenizer import IGNORE_INDEX, TokenizerBundle


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bucket_batches(
    lengths: Sequence[int],
    max_frames: int,
    num_buckets: int,
    shuffle: bool = False,
    batch_size: Optional[int] = None,
    seed: int = 0,
) -> List[List[int]]:
    """Group sample indices into frame-budget batches (reference semantics:
    bucketize -> order within -> greedy pack until max_frames)."""
    try:
        from ..utils.native import bucket_batches_native

        return bucket_batches_native(
            list(lengths), max_frames, num_buckets, shuffle, batch_size or 0, seed
        )
    except Exception:
        pass

    lengths = np.asarray(lengths)
    lo, hi = int(lengths.min()), int(lengths.max())
    if hi > max_frames:
        # Reference packing puts an over-budget sample in its own batch
        # (`data_module.py:82-144` greedy loop) rather than failing; warn so
        # real-corpus outliers are visible but non-fatal.
        import warnings

        n_long = int((lengths > max_frames).sum())
        warnings.warn(
            f"{n_long} sample(s) exceed max_frames={max_frames} "
            f"(longest {hi}); each becomes its own batch"
        )
    boundaries = np.linspace(lo, hi, num_buckets)
    assignments = np.searchsorted(boundaries, lengths, side="left")
    items = [(int(i), int(l), int(b)) for i, (l, b) in enumerate(zip(lengths, assignments))]
    if shuffle:
        rng = random.Random(seed)
        rng.shuffle(items)
    else:
        items.sort(key=lambda x: x[1], reverse=True)
    items.sort(key=lambda x: x[2])  # stable: keeps within-bucket order

    batches: List[List[int]] = []
    cur: List[int] = []
    cur_frames = 0
    for idx, length, _ in items:
        if (cur_frames + length > max_frames) or (batch_size and len(cur) == batch_size):
            if cur:
                batches.append(cur)
            cur, cur_frames = [idx], length
        else:
            cur.append(idx)
            cur_frames += length
    if cur:
        batches.append(cur)
    return batches


@dataclass
class CollateConfig:
    modality: str = "audiovisual"
    video_pad_multiple: int = 32
    token_pad_multiple: int = 8
    samples_per_frame: int = 640
    is_trainval: bool = True


def collate(
    samples: List[Dict],
    tok: TokenizerBundle,
    cfg: CollateConfig,
) -> Dict:
    """Static-shape batch dict (numpy, host). Keys follow models/omni.py.

    Also returns the static scalars the jitted step needs:
      - `audio_trim_len`: max(int(max_audio_len/16000*50), 25) computed on
        the *padded* audio buffer? No — on the true batch-max length,
        matching `modeling_OmniAVSR.py:536-537`, then rounded up to the
        padded frame count so shapes stay bucketed.
    """
    B = len(samples)
    out: Dict = {}

    if cfg.is_trainval:
        token_rows = [tok.encode(s["text"]) for s in samples]
        t_max = _round_up(max(len(r) for r in token_rows), cfg.token_pad_multiple)
        tokens = np.full((B, t_max), tok.pad_id, np.int32)
        labels = np.full((B, t_max), IGNORE_INDEX, np.int32)
        for i, r in enumerate(token_rows):
            tokens[i, : len(r)] = r
            labels[i, : len(r)] = r
        out["tokens"] = tokens
        out["labels"] = labels
    else:
        # test: bare BOS (llama) / empty (qwen); gold text rides along
        out["gold_text"] = [s["text"] for s in samples]
        out["tokens"] = np.full(
            (B, 1 if tok.family == "llama" else 0),
            tok.bos_id if tok.family == "llama" else 0,
            np.int32,
        )

    has_video = cfg.modality in ("video", "audiovisual") and "video" in samples[0]
    has_audio = cfg.modality in ("audio", "audiovisual") and "audio" in samples[0]

    if has_video:
        v_lens = [len(s["video"]) for s in samples]
        T = _round_up(max(v_lens), cfg.video_pad_multiple)
        H, W, C = samples[0]["video"].shape[1:]
        video = np.zeros((B, T, H, W, C), np.uint8)
        for i, s in enumerate(samples):
            video[i, : len(s["video"])] = s["video"]
        out["video"] = video
        out["video_len"] = np.asarray(v_lens, np.int32)

    if has_audio:
        a_lens = [len(s["audio"]) for s in samples]
        if has_video:
            S = out["video"].shape[1] * cfg.samples_per_frame
        else:
            S = _round_up(max(a_lens), cfg.samples_per_frame * cfg.video_pad_multiple)
        audio = np.zeros((B, S), np.float32)
        for i, s in enumerate(samples):
            n = min(len(s["audio"]), S)
            audio[i, :n] = s["audio"][:n]
        out["audio"] = audio
        out["audio_len"] = np.asarray(a_lens, np.int32)
        # static whisper trim computed from the padded buffer so every batch
        # in the same shape bucket compiles once; the extra (<=  pad) tokens
        # are masked out of the loss via lengths? No: reference trims at the
        # true batch max — keep that, but bucket it to the frame multiple.
        true_trim = whisper_token_len(max(a_lens))
        out["audio_trim_len"] = int(
            min(_round_up(true_trim, 25), 1500)
        )
    return out
