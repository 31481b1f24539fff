"""Lightweight / dynamic convolution ops.

Behaviour spec: fairseq `modules/lightweight_convolution.py::
LightweightConv1dTBC` and `modules/dynamic_convolution.py::
DynamicConv1dTBC._forward_unfolded` (the CUDA kernels compute the same
function). Pinned against a direct shifted-sum numpy reference — causal
and centered paddings, softmax on/off, head sharing, K > T truncation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.ops.lightconv import dynamic_conv, lightweight_conv


def _np_unfold(x, K, padding_l):
    """y[b,t,k,c] = x[b, t - padding_l + k, c], zero outside."""
    B, T, C = x.shape
    out = np.zeros((B, T, K, C), x.dtype)
    for t in range(T):
        for k in range(K):
            s = t - padding_l + k
            if 0 <= s < T:
                out[:, t, k] = x[:, s]
    return out


def _softmax(w, axis):
    e = np.exp(w - w.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


@pytest.mark.parametrize("H,softmax,padding_l", [
    (1, False, 2), (4, True, 2), (4, True, 1), (16, False, 0),
])
def test_lightweight_conv_matches_numpy(H, softmax, padding_l):
    rng = np.random.RandomState(0)
    B, T, C, K = 2, 9, 16, 3
    x = rng.randn(B, T, C).astype(np.float32)
    w = rng.randn(H, K).astype(np.float32)
    bias = rng.randn(C).astype(np.float32)
    y = lightweight_conv(jnp.asarray(x), jnp.asarray(w), padding_l,
                         weight_softmax=softmax, bias=jnp.asarray(bias))
    wn = _softmax(w, -1) if softmax else w
    R = C // H
    xu = _np_unfold(x, K, padding_l)
    ref = np.zeros((B, T, C), np.float32)
    for c in range(C):
        ref[:, :, c] = (xu[:, :, :, c] * wn[c // R]).sum(-1)
    ref = ref + bias
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("softmax,padding_l", [(True, 3), (False, 2), (True, 0)])
def test_dynamic_conv_matches_numpy(softmax, padding_l):
    rng = np.random.RandomState(1)
    B, T, C, H, K = 2, 8, 12, 4, 4
    x = rng.randn(B, T, C).astype(np.float32)
    wl = rng.randn(C, H * K).astype(np.float32) * 0.3
    lb = rng.randn(H * K).astype(np.float32)
    y = dynamic_conv(jnp.asarray(x), jnp.asarray(x), jnp.asarray(wl),
                     num_heads=H, kernel_size=K, padding_l=padding_l,
                     weight_softmax=softmax, linear_bias=jnp.asarray(lb))
    wt = (x @ wl + lb).reshape(B, T, H, K)
    if softmax:
        wt = _softmax(wt, -1)
    R = C // H
    xu = _np_unfold(x, K, padding_l)
    ref = np.zeros((B, T, C), np.float32)
    for h in range(H):
        for r in range(R):
            c = h * R + r
            ref[:, :, c] = (xu[:, :, :, c] * wt[:, :, h]).sum(-1)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_dynamic_conv_kernel_longer_than_sequence():
    """K > T with causal padding: the reference keeps the LAST T taps
    (softmax still over the full K when weight_softmax)."""
    rng = np.random.RandomState(2)
    B, T, C, H, K = 1, 3, 8, 2, 6
    x = rng.randn(B, T, C).astype(np.float32)
    wl = rng.randn(C, H * K).astype(np.float32) * 0.3
    y = dynamic_conv(jnp.asarray(x), jnp.asarray(x), jnp.asarray(wl),
                     num_heads=H, kernel_size=K, padding_l=K - 1,
                     weight_softmax=True)
    wt = _softmax((x @ wl).reshape(B, T, H, K), -1)[..., K - T:]
    R = C // H
    xu = _np_unfold(x, T, T - 1)
    ref = np.zeros((B, T, C), np.float32)
    for h in range(H):
        for r in range(R):
            c = h * R + r
            ref[:, :, c] = (xu[:, :, :, c] * wt[:, :, h]).sum(-1)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_causal_padding_is_causal():
    """padding_l = K-1: output at t must not depend on x[t+1:]."""
    rng = np.random.RandomState(3)
    B, T, C, K = 1, 10, 8, 4
    x = rng.randn(B, T, C).astype(np.float32)
    w = rng.randn(2, K).astype(np.float32)
    y1 = np.asarray(lightweight_conv(jnp.asarray(x), jnp.asarray(w), K - 1))
    x2 = x.copy()
    x2[:, 6:] = 99.0
    y2 = np.asarray(lightweight_conv(jnp.asarray(x2), jnp.asarray(w), K - 1))
    np.testing.assert_allclose(y1[:, :6], y2[:, :6], rtol=1e-6)


def test_gradients_flow():
    x = jnp.asarray(np.random.RandomState(4).randn(2, 6, 8), jnp.float32)
    w = jnp.ones((2, 3), jnp.float32)
    g = jax.grad(lambda w: jnp.sum(
        lightweight_conv(x, w, 2, weight_softmax=True) ** 2))(w)
    assert np.abs(np.asarray(g)).sum() > 0
