"""On-device, batched data augmentations.

The reference applies per-sample torch transforms in dataloader workers
(`datamodule/transforms.py:29-131`). Here augmentation is vectorised XLA
running on-device inside the train step — zero host compute, fused with the
encoders. Semantics match the reference per-sample ops:

  video train: /255 -> RandomCrop(88) -> Grayscale(luma) ->
               AdaptiveTimeMask(10, 25) -> Normalize(0.421, 0.165)
  video eval : /255 -> CenterCrop(88) -> Grayscale -> Normalize
  audio train: AdaptiveTimeMask(6400, 16000) -> AddNoise(babble, random SNR)
               -> per-utterance layer_norm(eps 1e-8)
  audio eval : [AddNoise at fixed snr_target] -> layer_norm

AdaptiveTimeMask (`transforms.py:37-57`): n = int((len + stride - 0.1) //
stride) masks, each of width t ~ U[0, window), start ~ U[0, len - t).
AddNoise (`transforms.py:60-81`): torchaudio add_noise — noise scaled so
10*log10(E_speech / E_noise_scaled) = snr; snr 999999 ~ clean.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def adaptive_time_mask(
    rng: jax.Array,
    x: jax.Array,  # (B, T, ...) — masks zero the time axis
    lengths: jax.Array,  # (B,)
    window: int,
    stride: int,
    max_masks: int,
) -> jax.Array:
    """Batched AdaptiveTimeMask. max_masks must be >= (T + stride)/stride."""
    B, T = x.shape[:2]
    k_t, k_e, k_s = jax.random.split(rng, 3)
    n_mask = ((lengths.astype(jnp.float32) + stride - 0.1) // stride).astype(jnp.int32)  # (B,)
    # reference draws (t, t_end) independently (`transforms.py:48-56`):
    # t bounds the start range, t_end is the masked extent
    bounds = jax.random.randint(k_t, (B, max_masks), 0, window)
    widths = jax.random.randint(k_e, (B, max_masks), 0, window)
    u = jax.random.uniform(k_s, (B, max_masks))
    span = jnp.maximum(lengths[:, None] - bounds, 1)
    starts = (u * span.astype(jnp.float32)).astype(jnp.int32)
    active = jnp.arange(max_masks)[None, :] < n_mask[:, None]

    idx = jnp.arange(T)[None, None, :]  # (1,1,T)
    covered = (
        (idx >= starts[:, :, None])
        & (idx < (starts + widths)[:, :, None])
        & active[:, :, None]
    )  # (B, M, T)
    keep = ~jnp.any(covered, axis=1)  # (B, T)
    keep = keep.reshape(B, T, *([1] * (x.ndim - 2)))
    return x * keep.astype(x.dtype)


def add_noise_snr(
    rng: jax.Array,
    speech: jax.Array,  # (B, S)
    lengths: jax.Array,  # (B,)
    noise_bank: jax.Array,  # (N,) long noise waveform
    snr_db: jax.Array,  # (B,) per-sample SNR (already chosen)
) -> jax.Array:
    """Mix a random noise segment at the given SNR over the valid region."""
    B, S = speech.shape
    N = noise_bank.shape[0]
    k_off = jax.random.split(rng, 1)[0]
    max_start = jnp.maximum(N - S, 1)
    offsets = jax.random.randint(k_off, (B,), 0, max_start)
    idx = offsets[:, None] + jnp.arange(S)[None, :]
    noise = noise_bank[jnp.clip(idx, 0, N - 1)]  # (B, S)

    valid = (jnp.arange(S)[None, :] < lengths[:, None]).astype(jnp.float32)
    sp = speech.astype(jnp.float32) * valid
    nz = noise.astype(jnp.float32) * valid
    e_speech = jnp.sum(jnp.square(sp), axis=1)
    e_noise = jnp.maximum(jnp.sum(jnp.square(nz), axis=1), 1e-10)
    # scale so that 10*log10(e_speech / (scale^2 e_noise)) = snr
    scale = jnp.sqrt(e_speech / (e_noise * jnp.power(10.0, snr_db.astype(jnp.float32) / 10.0)))
    return (sp + scale[:, None] * nz).astype(speech.dtype) * valid


def utterance_layer_norm(x: jax.Array, lengths: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Per-utterance standardisation over the valid region
    (`transforms.py:113-115`: F.layer_norm over the whole sample)."""
    B, S = x.shape
    valid = (jnp.arange(S)[None, :] < lengths[:, None]).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1.0)
    xf = x.astype(jnp.float32) * valid
    mean = jnp.sum(xf, axis=1, keepdims=True) / n
    var = jnp.sum(jnp.square(xf - mean) * valid, axis=1, keepdims=True) / n
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * valid).astype(x.dtype)


def crop_video(
    rng: Optional[jax.Array],
    video: jax.Array,  # (B, T, H, W, C) uint8 or float
    out_size: int = 88,
    train: bool = False,
) -> jax.Array:
    """RandomCrop (train, per-sample offset) or CenterCrop (eval)."""
    B, T, H, W, C = video.shape
    if train:
        assert rng is not None
        kh, kw = jax.random.split(rng)
        oh = jax.random.randint(kh, (B,), 0, H - out_size + 1)
        ow = jax.random.randint(kw, (B,), 0, W - out_size + 1)
    else:
        oh = jnp.full((B,), (H - out_size) // 2)
        ow = jnp.full((B,), (W - out_size) // 2)

    def crop_one(v, y, x):
        return jax.lax.dynamic_slice(v, (0, y, x, 0), (T, out_size, out_size, C))

    return jax.vmap(crop_one)(video, oh, ow)


def grayscale_luma(video: jax.Array) -> jax.Array:
    """torchvision Grayscale: 0.299 R + 0.587 G + 0.114 B (last axis C)."""
    if video.shape[-1] == 1:
        return video
    w = jnp.asarray([0.299, 0.587, 0.114], video.dtype)
    return jnp.einsum("...c,c->...", video, w)[..., None]


def horizontal_flip(
    rng: jax.Array,
    video: jax.Array,  # (B, T, H, W, C)
    p: float = 0.5,
) -> jax.Array:
    """Per-sample whole-clip horizontal flip with probability p
    (`av_hubert/avhubert/utils.py:122-139`: one draw per clip, every frame
    cv2.flip'd along width)."""
    B = video.shape[0]
    flip = jax.random.uniform(rng, (B,)) < p  # (B,)
    flipped = video[:, :, :, ::-1, :]
    return jnp.where(flip[:, None, None, None, None], flipped, video)


def pretrain_video_pipeline(
    rng: Optional[jax.Array],
    video_u8: jax.Array,  # (B, T, H, W, C)
    train: bool,
    mean: float = 0.421,
    std: float = 0.165,
    flip_p: float = 0.5,
) -> jax.Array:
    """AV-HuBERT PRE-TRAINING image aug, batched on-device: /255 ->
    RandomCrop(88) -> HorizontalFlip(0.5) -> Normalize
    (`av_hubert/avhubert/hubert_dataset.py:216-220`). Unlike the fine-tune
    `video_pipeline`, pretraining applies NO AdaptiveTimeMask and adds the
    flip. Eval: CenterCrop, no flip (`:222-225`)."""
    x = video_u8.astype(jnp.float32) / 255.0
    if train:
        k_crop, k_flip = jax.random.split(rng)
    else:
        k_crop = k_flip = None
    x = crop_video(k_crop, x, 88, train)
    x = grayscale_luma(x)
    if train:
        x = horizontal_flip(k_flip, x, flip_p)
    return (x - mean) / std


def video_pipeline(
    rng: Optional[jax.Array],
    video_u8: jax.Array,  # (B, T, H, W, C)
    lengths: jax.Array,
    train: bool,
    mean: float = 0.421,
    std: float = 0.165,
    mask_window: int = 10,
    mask_stride: int = 25,
) -> jax.Array:
    """Full reference video transform, batched on-device. Returns f32
    (B, T, 88, 88, 1)."""
    x = video_u8.astype(jnp.float32) / 255.0
    if train:
        k_crop, k_mask = jax.random.split(rng)
    else:
        k_crop = k_mask = None
    x = crop_video(k_crop, x, 88, train)
    x = grayscale_luma(x)
    if train:
        T = x.shape[1]
        max_masks = (T + mask_stride) // mask_stride + 1
        x = adaptive_time_mask(k_mask, x, lengths, mask_window, mask_stride, max_masks)
    return (x - mean) / std


def audio_pipeline(
    rng: Optional[jax.Array],
    audio: jax.Array,  # (B, S) f32
    lengths: jax.Array,
    train: bool,
    noise_bank: Optional[jax.Array] = None,
    snr_target: Optional[float] = None,
    snr_choices: Sequence[float] = (-5.0, 0.0, 5.0, 10.0, 15.0, 20.0, 999999.0),
    mask_window: int = 6400,
    mask_stride: int = 16000,
) -> jax.Array:
    """Full reference audio transform, batched on-device."""
    B, S = audio.shape
    x = audio
    if train:
        k_mask, k_snr, k_noise = jax.random.split(rng, 3)
        max_masks = (S + mask_stride) // mask_stride + 1
        x = adaptive_time_mask(k_mask, x[..., None], lengths, mask_window, mask_stride, max_masks)[..., 0]
        if noise_bank is not None:
            snr = jnp.asarray(snr_choices)[
                jax.random.randint(k_snr, (B,), 0, len(snr_choices))
            ]
            x = add_noise_snr(k_noise, x, lengths, noise_bank, snr)
    elif snr_target is not None and snr_target < 999998 and noise_bank is not None:
        k_noise = rng if rng is not None else jax.random.PRNGKey(0)
        x = add_noise_snr(k_noise, x, lengths, noise_bank, jnp.full((B,), snr_target))
    return utterance_layer_norm(x, lengths)
