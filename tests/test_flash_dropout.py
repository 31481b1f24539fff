"""In-kernel attention-probs dropout: forward/backward parity vs a masked
XLA reference that applies the IDENTICAL position-hash mask.

The mask oracle calls ops.flash_attention._keep_mask directly (it is plain
jnp code, usable outside pallas), so these tests pin the kernel math —
dropout of the normalized probs, torch semantics `dropout(softmax(s)) @ v`
(reference fairseq multihead_attention.py:389-494) — and the tiling
independence that makes fwd and bwd agree despite different block clamps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.ops.flash_attention import _keep_mask, flash_attention
from omni_avsr_tpu.ops.flash_attention_bwd import flash_attention_trainable


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32) * 0.5


def _full_keep(seed, BH, T, S, rate):
    """(BH, T, S) bool keep mask — the same hash the kernels evaluate."""
    rows = [_keep_mask(jnp.int32(seed), jnp.int32(h), 0, 0, T, S, S, rate)
            for h in range(BH)]
    return jnp.stack(rows)


def _masked_ref(q, k, v, keep, rate):
    """dropout(softmax(q k^T / sqrt(d))) @ v with an explicit mask."""
    B, T, H, D = q.shape
    s = jnp.einsum("bthd,bshd->bhts", q, k) * (D ** -0.5)
    p = jax.nn.softmax(s, axis=-1)
    km = keep.reshape(B, H, T, T)
    p = jnp.where(km, p, 0.0) / (1.0 - rate)
    return jnp.einsum("bhts,bshd->bthd", p, v)


def test_keep_fraction():
    keep = _full_keep(seed=1234, BH=4, T=256, S=256, rate=0.3)
    frac = float(jnp.mean(keep.astype(jnp.float32)))
    assert abs(frac - 0.7) < 0.01, frac


def test_keep_differs_across_seeds_and_heads():
    a = _full_keep(11, 2, 64, 64, 0.5)
    b = _full_keep(12, 2, 64, 64, 0.5)
    assert bool(jnp.any(a != b))
    assert bool(jnp.any(a[0] != a[1]))


@pytest.mark.parametrize("rate", [0.1, 0.5])
def test_dropout_forward_matches_masked_reference(rate):
    B, T, H, D = 2, 192, 2, 64
    q, k, v = _rand((B, T, H, D), 0), _rand((B, T, H, D), 1), _rand((B, T, H, D), 2)
    seed = 77
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True,
                          dropout_rate=rate, dropout_seed=jnp.int32(seed))
    keep = _full_keep(seed, B * H, T, T, rate)
    ref = _masked_ref(q, k, v, keep, rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_dropout_grads_match_masked_reference():
    B, T, H, D = 2, 128, 2, 64
    rate, seed = 0.25, 31
    q, k, v = _rand((B, T, H, D), 3), _rand((B, T, H, D), 4), _rand((B, T, H, D), 5)
    keep = _full_keep(seed, B * H, T, T, rate)

    def loss(fn):
        def f(q, k, v):
            out = fn(q, k, v)
            w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) * 1e-3
            return jnp.sum(out.astype(jnp.float32) * w)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    ref_fn = lambda q, k, v: _masked_ref(q, k, v, keep, rate)
    fl_fn = lambda q, k, v: flash_attention_trainable(
        q, k, v, block_q=128, block_k=128, interpret=True,
        dropout_rate=rate, dropout_seed=jnp.int32(seed))
    rq, rk, rv = loss(ref_fn)
    fq, fk, fv = loss(fl_fn)
    np.testing.assert_allclose(np.asarray(fq), np.asarray(rq), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fk), np.asarray(rk), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(rv), atol=2e-3, rtol=1e-3)


def test_dropout_grads_gqa():
    """GQA (Hq=4, Hkv=2): the hash is keyed on the flattened *query* head
    index in fwd, dq, AND dkv kernels — grads must match an explicit-mask
    reference that expands kv heads."""
    B, T, Hq, Hkv, D = 1, 128, 4, 2, 64
    rate, seed = 0.3, 13
    q = _rand((B, T, Hq, D), 20)
    k = _rand((B, T, Hkv, D), 21)
    v = _rand((B, T, Hkv, D), 22)
    keep = _full_keep(seed, B * Hq, T, T, rate).reshape(B, Hq, T, T)

    def ref(q, k, v):
        G = Hq // Hkv
        kx = jnp.repeat(k, G, axis=2)
        vx = jnp.repeat(v, G, axis=2)
        s = jnp.einsum("bthd,bshd->bhts", q, kx) * (D ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.where(keep, p, 0.0) / (1.0 - rate)
        return jnp.einsum("bhts,bshd->bthd", p, vx)

    fl = lambda q, k, v: flash_attention_trainable(
        q, k, v, block_q=128, block_k=128, interpret=True,
        dropout_rate=rate, dropout_seed=jnp.int32(seed))

    def grads(fn):
        def loss(q, k, v):
            out = fn(q, k, v)
            w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) * 1e-3
            return jnp.sum(out.astype(jnp.float32) * w)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    rq, rk, rv = grads(ref)
    fq, fk, fv = grads(fl)
    np.testing.assert_allclose(np.asarray(fq), np.asarray(rq), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fk), np.asarray(rk), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(rv), atol=2e-3, rtol=1e-3)


def test_dropout_mask_is_tiling_independent():
    B, T, H, D = 1, 256, 2, 64
    q, k, v = _rand((B, T, H, D), 6), _rand((B, T, H, D), 7), _rand((B, T, H, D), 8)
    a = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True,
                        dropout_rate=0.4, dropout_seed=jnp.int32(9))
    b = flash_attention(q, k, v, block_q=256, block_k=256, interpret=True,
                        dropout_rate=0.4, dropout_seed=jnp.int32(9))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5)


def test_dropout_with_lengths_and_causal():
    B, T, H, D = 2, 128, 2, 64
    rate, seed = 0.2, 5
    q, k, v = _rand((B, T, H, D), 9), _rand((B, T, H, D), 10), _rand((B, T, H, D), 11)
    lens = jnp.array([T, 90], jnp.int32)
    out = flash_attention_trainable(
        q, k, v, causal=True, kv_lengths=lens, block_q=128, block_k=128,
        interpret=True, dropout_rate=rate, dropout_seed=jnp.int32(seed))

    keep = _full_keep(seed, B * H, T, T, rate).reshape(B, H, T, T)
    s = jnp.einsum("bthd,bshd->bhts", q, k) * (D ** -0.5)
    tri = jnp.tril(jnp.ones((T, T), bool))
    pad = (jnp.arange(T)[None] < lens[:, None])[:, None, None, :]
    s = jnp.where(tri[None, None] & pad, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(keep, p, 0.0) / (1.0 - rate)
    ref = jnp.einsum("bhts,bshd->bthd", p, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
