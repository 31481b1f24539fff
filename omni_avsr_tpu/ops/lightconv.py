"""Lightweight and dynamic convolutions (Pay Less Attention, Wu et al.).

The reference vendors fairseq's CUDA kernels for these
(`fairseq/modules/lightconv_layer`, `dynamicconv_layer`, and the TBC
fallbacks `lightweight_convolution.py::LightweightConv1dTBC` /
`dynamic_convolution.py::DynamicConv1dTBC`) — none of which run on the
AVSR path, but they are part of the framework surface. TPU-native
re-design: batch-major (B, T, C) layout (TBC is a CUDA-kernel layout
artifact), the K-tap window materialised as K fused shifted slices, and
the head-shared / per-position kernel application as one MXU einsum —
no scatter/gather, static shapes throughout.

Semantics match `_forward_unfolded`: output[t] sees
x[t - padding_l .. t - padding_l + K - 1] with zero padding outside;
`weight_softmax` normalises the K taps; channels share taps in H head
groups of R = C // H consecutive channels; dynamic conv predicts the taps
per (batch, time, head) from the query via a linear map, including the
K > T causal truncation special case.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _unfold(x: jax.Array, K: int, padding_l: int) -> jax.Array:
    """(B, T, C) -> (B, T, K, C): window k covers x[t - padding_l + k],
    zero outside (fairseq `modules/unfold.py::unfold1d` semantics)."""
    B, T, C = x.shape
    pad_r = max(K - 1 - padding_l, 0)  # padding_l > K-1 never reads right
    xp = jnp.pad(x, ((0, 0), (padding_l, pad_r), (0, 0)))
    return jnp.stack([xp[:, k:k + T] for k in range(K)], axis=2)


def lightweight_conv(
    x: jax.Array,  # (B, T, C)
    weight: jax.Array,  # (H, K) — heads share over C // H channel groups
    padding_l: int,
    weight_softmax: bool = False,
    bias: Optional[jax.Array] = None,  # (C,)
) -> jax.Array:
    """LightweightConv1dTBC forward (batch-major)."""
    B, T, C = x.shape
    H, K = weight.shape
    if C % H:
        raise ValueError(f"channels {C} not divisible by {H} heads")
    R = C // H
    w = jax.nn.softmax(weight.astype(jnp.float32), axis=-1) if weight_softmax \
        else weight.astype(jnp.float32)
    xu = _unfold(x, K, padding_l)  # (B, T, K, C)
    wc = jnp.repeat(w, R, axis=0)  # (C, K): per-channel taps
    y = jnp.einsum("btkc,ck->btc", xu.astype(jnp.float32), wc)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def dynamic_conv(
    x: jax.Array,  # (B, T, C)
    query: jax.Array,  # (B, T, C) — usually x itself
    weight_linear: jax.Array,  # (C, H * K) kernel-prediction projection
    num_heads: int,
    kernel_size: int,
    padding_l: int,
    weight_softmax: bool = True,
    linear_bias: Optional[jax.Array] = None,  # (H * K,)
    conv_bias: Optional[jax.Array] = None,  # (C,)
) -> jax.Array:
    """DynamicConv1dTBC `_forward_unfolded` (batch-major): taps predicted
    per (b, t, head) from the query, softmax over the FULL kernel before
    the K > T truncation, exactly as the reference orders it."""
    B, T, C = x.shape
    H, K = num_heads, kernel_size
    if C % H:
        raise ValueError(f"channels {C} not divisible by {H} heads")
    R = C // H
    wt = query.astype(jnp.float32) @ weight_linear.astype(jnp.float32)
    if linear_bias is not None:
        wt = wt + linear_bias.astype(jnp.float32)
    wt = wt.reshape(B, T, H, K)
    if weight_softmax:
        wt = jax.nn.softmax(wt, axis=-1)
    if K > T and padding_l == K - 1:
        # causal kernel longer than the sequence: keep the last T taps
        wt = wt[..., K - T:]
        K, padding_l = T, T - 1
    else:
        wt = wt[..., :K]
    xu = _unfold(x, K, padding_l).reshape(B, T, K, H, R)
    y = jnp.einsum("btkhr,bthk->bthr", xu.astype(jnp.float32), wt)
    y = y.reshape(B, T, C)
    if conv_bias is not None:
        y = y + conv_bias.astype(jnp.float32)
    return y.astype(x.dtype)
