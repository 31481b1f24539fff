"""Normalisation ops with f32 accumulation under a bf16 compute policy.

Numerics notes for PyTorch-checkpoint parity:
  - torch LayerNorm computes in the input dtype but the reference runs
    bf16-true with fp32 LayerNorm weights cast down; we normalise in f32 and
    cast back, which is at least as accurate.
  - Llama/Qwen RMSNorm upcasts to f32 internally (HF does the same).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array | None, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last dim. torch.nn.LayerNorm semantics."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """RMSNorm as in HF Llama/Qwen: f32 variance, scale applied after downcast.

    HF computes `hidden * rsqrt(mean(hidden^2) + eps)` in f32, casts back to
    the input dtype, THEN multiplies by the (f32/bf16) weight. We reproduce
    that order exactly — it matters at bf16.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = (xf * jax.lax.rsqrt(var + eps)).astype(dtype)
    return y * weight.astype(dtype)


def batch_norm_inference(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    eps: float = 1e-5,
    channel_axis: int = -1,
) -> jax.Array:
    """Inference-mode BatchNorm (running stats), torch semantics.

    The reference's ResNet3D BatchNorms run frozen (encoder requires_grad
    False and Lightning keeps them in train() but the encoder is frozen;
    for WER parity at converted weights inference-mode stats are the correct
    choice).
    """
    shape = [1] * x.ndim
    shape[channel_axis] = x.shape[channel_axis]
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    scale_f = (scale.astype(jnp.float32) * inv).reshape(shape)
    bias_f = (bias.astype(jnp.float32) - mean.astype(jnp.float32) * scale.astype(jnp.float32) * inv).reshape(shape)
    return (x.astype(jnp.float32) * scale_f + bias_f).astype(x.dtype)
