"""Rotary position embeddings (plain + Llama-3 frequency-scaled).

Matches HF `LlamaRotaryEmbedding` / `apply_rotary_pos_emb` numerics:
frequencies in f32, cos/sin in f32, rotation applied in compute dtype.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LLMConfig


@functools.lru_cache(maxsize=16)
def _inv_freq(cfg: LLMConfig) -> np.ndarray:
    """Per-dim inverse frequencies, with optional llama3 rescaling."""
    head_dim = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    if cfg.rope_scaling_factor is not None:
        # llama3 rope scaling (HF `_compute_llama3_parameters`)
        factor = cfg.rope_scaling_factor
        low = cfg.rope_low_freq_factor
        high = cfg.rope_high_freq_factor
        orig = cfg.rope_original_max_position
        low_wavelen = orig / low
        high_wavelen = orig / high
        wavelen = 2.0 * np.pi / inv
        inv_scaled = np.where(wavelen > low_wavelen, inv / factor, inv)
        smooth = (orig / wavelen - low) / (high - low)
        smoothed = (1.0 - smooth) / factor * inv + smooth * inv
        is_medium = (wavelen >= high_wavelen) & (wavelen <= low_wavelen)
        inv = np.where(is_medium, smoothed, inv_scaled)
    return inv.astype(np.float32)


def rope_cos_sin(cfg: LLMConfig, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for integer positions of any shape -> (*pos, head_dim).

    HF convention: angles repeated as [f0..f{d/2-1}, f0..f{d/2-1}].
    """
    inv = jnp.asarray(_inv_freq(cfg))
    freqs = positions.astype(jnp.float32)[..., None] * inv  # (*pos, d/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Apply rotary embedding. q/k: (..., T, H, D); cos/sin: (..., T, D).

    Broadcasts cos/sin over the head axis.
    """
    cos_b = cos[..., :, None, :].astype(q.dtype)
    sin_b = sin[..., :, None, :].astype(q.dtype)
    q_out = q * cos_b + _rotate_half(q) * sin_b
    k_out = k * cos_b + _rotate_half(k) * sin_b
    return q_out, k_out
