"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.ops.attention import (
    causal_mask,
    combine_masks,
    dot_product_attention,
    padding_mask_from_lengths,
)
from omni_avsr_tpu.ops.flash_attention import flash_attention


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32) * 0.5


@pytest.mark.parametrize("T,S,Hq,Hkv,D", [
    (256, 256, 4, 4, 64),     # MHA, block-aligned
    (200, 200, 4, 2, 64),     # GQA, unaligned lengths
    (384, 384, 8, 8, 128),    # head dim 128
])
def test_flash_matches_xla_bidirectional(T, S, Hq, Hkv, D):
    q = _rand((2, T, Hq, D), 0)
    k = _rand((2, S, Hkv, D), 1)
    v = _rand((2, S, Hkv, D), 2)
    ref = dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_causal():
    T, H, D = 256, 4, 64
    q = _rand((1, T, H, D), 3)
    k = _rand((1, T, H, D), 4)
    v = _rand((1, T, H, D), 5)
    ref = dot_product_attention(q, k, v, mask=causal_mask(T, T))
    out = flash_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_kv_lengths():
    T, H, D = 128, 2, 64
    B = 2
    q = _rand((B, T, H, D), 6)
    k = _rand((B, T, H, D), 7)
    v = _rand((B, T, H, D), 8)
    lens = jnp.array([T, 70], jnp.int32)
    ref = dot_product_attention(
        q, k, v, mask=padding_mask_from_lengths(lens, T)[:, None, None, :]
    )
    out = flash_attention(q, k, v, kv_lengths=lens, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_causal_plus_lengths():
    T, H, D = 256, 2, 64
    q = _rand((1, T, H, D), 9)
    k = _rand((1, T, H, D), 10)
    v = _rand((1, T, H, D), 11)
    lens = jnp.array([150], jnp.int32)
    m = combine_masks(
        causal_mask(T, T), padding_mask_from_lengths(lens, T)[:, None, None, :]
    )
    ref = dot_product_attention(q, k, v, mask=m)
    out = flash_attention(q, k, v, causal=True, kv_lengths=lens, interpret=True)
    # rows past the kv length attend to nothing in ref (NaN-free via NEG_INF);
    # compare only valid query rows
    np.testing.assert_allclose(
        np.asarray(out)[:, :150], np.asarray(ref)[:, :150], atol=2e-5, rtol=1e-4
    )
