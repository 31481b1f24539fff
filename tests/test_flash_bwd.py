"""Flash attention backward vs jax.grad of the XLA reference (interpret)."""

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
from omni_avsr_tpu.ops.flash_attention_bwd import flash_attention_trainable


def _grads(fn, q, k, v):
    def loss(q, k, v):
        out = fn(q, k, v)
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) * 1e-3
        return jnp.sum(out.astype(jnp.float32) * w)

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32) * 0.5


@pytest.mark.parametrize("T,Hq,Hkv,D,causal", [
    (256, 4, 4, 64, False),
    (200, 4, 2, 64, True),    # GQA + causal + unaligned
    (128, 8, 8, 128, True),
])
def test_flash_grads_match_xla(T, Hq, Hkv, D, causal):
    B = 2
    q = _rand((B, T, Hq, D), 0)
    k = _rand((B, T, Hkv, D), 1)
    v = _rand((B, T, Hkv, D), 2)

    mask = causal_mask(T, T) if causal else None
    ref_fn = lambda q, k, v: dot_product_attention(
        q, k, v, mask=jnp.broadcast_to(mask, (B, 1, T, T)) if mask is not None else None
    )
    fl_fn = lambda q, k, v: flash_attention_trainable(
        q, k, v, causal=causal, block_q=128, block_k=128, interpret=True
    )
    rq, rk, rv = _grads(ref_fn, q, k, v)
    fq, fk, fv = _grads(fl_fn, q, k, v)
    np.testing.assert_allclose(np.asarray(fq), np.asarray(rq), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fk), np.asarray(rk), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(rv), atol=2e-3, rtol=1e-3)


def test_flash_grads_with_lengths():
    B, T, H, D = 2, 128, 2, 64
    q = _rand((B, T, H, D), 3)
    k = _rand((B, T, H, D), 4)
    v = _rand((B, T, H, D), 5)
    lens = jnp.array([T, 70], jnp.int32)
    m = padding_mask_from_lengths(lens, T)[:, None, None, :]
    ref_fn = lambda q, k, v: dot_product_attention(q, k, v, mask=m)
    fl_fn = lambda q, k, v: flash_attention_trainable(
        q, k, v, kv_lengths=lens, block_q=128, block_k=128, interpret=True
    )
    rq, rk, rv = _grads(ref_fn, q, k, v)
    fq, fk, fv = _grads(fl_fn, q, k, v)
    np.testing.assert_allclose(np.asarray(fq), np.asarray(rq), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fk), np.asarray(rk), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(rv), atol=2e-3, rtol=1e-3)


def test_forward_value_unchanged():
    B, T, H, D = 1, 256, 4, 64
    q = _rand((B, T, H, D), 6)
    k = _rand((B, T, H, D), 7)
    v = _rand((B, T, H, D), 8)
    ref = dot_product_attention(q, k, v)
    out = flash_attention_trainable(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
