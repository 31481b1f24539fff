"""Matryoshka token compression: average-pooling and frame-stacking.

Reference semantics (`modeling_OmniAVSR.py:461-606`):
  - "avg-pooling": nn.AvgPool1d(rate) over time — kernel=stride=rate, no
    padding, so the remainder frames are dropped and every window is full.
  - "stack": concatenate `rate` consecutive frames feature-wise; remainder
    dropped (`:490-493`).

Both are pure reshapes/means — XLA fuses them into the adjacent projector
matmul, so no Pallas kernel is warranted here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def avg_pool_time(x: jax.Array, rate: int) -> jax.Array:
    """(B, T, D) -> (B, T//rate, D), mean over non-overlapping windows."""
    if rate == 1:
        return x
    B, T, D = x.shape
    Tc = (T // rate) * rate
    return jnp.mean(x[:, :Tc].reshape(B, T // rate, rate, D), axis=2)


def stack_time(x: jax.Array, rate: int) -> jax.Array:
    """(B, T, D) -> (B, T//rate, rate*D), remainder frames dropped."""
    if rate == 1:
        return x
    B, T, D = x.shape
    Tc = (T // rate) * rate
    return x[:, :Tc].reshape(B, T // rate, rate * D)


def compress(x: jax.Array, rate: int, mode: str) -> jax.Array:
    if mode == "avg-pooling":
        return avg_pool_time(x, rate)
    if mode == "stack":
        return stack_time(x, rate)
    raise ValueError(f"unknown compression mode: {mode}")


def compressed_len(T: int, rate: int) -> int:
    return T // rate
