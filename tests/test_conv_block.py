"""Pallas fused conv+BN+PReLU kernel (ops/conv_block.py) parity vs the XLA
reference, interpreted on CPU. Covers every BasicBlock configuration the
ResNet3D trunk uses (`av_hubert/avhubert/resnet.py:35-60`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.ops.conv_block import (
    _FUSED,
    _reference_conv,
    conv2d_fused_pallas,
    bn_fold,
)


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale)


@pytest.mark.parametrize("case", [
    # (F, H, Cin, Cout, k, stride, pad, affine, act, residual)
    (9, 22, 64, 64, 3, 1, 1, True, True, True),     # layer1 block
    (4, 22, 64, 128, 3, 2, 1, True, True, False),   # layer2 b0 conv1
    (4, 22, 64, 128, 1, 2, 0, True, False, False),  # downsample
    (4, 11, 128, 128, 3, 1, 1, False, False, False),  # raw conv (train mode)
    (4, 6, 256, 256, 3, 1, 1, True, True, True),    # layer3
    (4, 3, 512, 512, 3, 1, 1, True, True, True),    # layer4
])
def test_kernel_matches_reference(case):
    F, H, Cin, Cout, k, stride, pad, affine, act, residual = case
    x = _rand((F, H, H, Cin), 0, 0.5).astype(jnp.bfloat16)
    w = _rand((k, k, Cin, Cout), 1, 0.1)
    Ho = (H + 2 * pad - k) // stride + 1
    scale = _rand((Cout,), 2, 0.3) + 1.0 if affine else None
    bias = _rand((Cout,), 3, 0.3) if affine else None
    a = jnp.abs(_rand((Cout,), 4, 0.25)) if act else None
    res = (_rand((F, Ho, Ho, Cout), 5, 0.5).astype(jnp.bfloat16)
           if residual else None)

    ref = _reference_conv(x, w, stride, pad, scale, bias, a, res)
    out = conv2d_fused_pallas(x, w, stride, pad, scale, bias, a, res,
                              interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.15, rtol=0.05)  # bf16 store; accums both f32


def test_custom_vjp_grads_match_reference():
    """The custom_vjp backward (XLA recompute) must equal grads of the
    reference implementation."""
    F, H, Cin, Cout = 4, 8, 8, 8
    x = _rand((F, H, H, Cin), 0, 0.5)
    w = _rand((3, 3, Cin, Cout), 1, 0.2)
    scale = _rand((Cout,), 2, 0.2) + 1.0
    bias = _rand((Cout,), 3, 0.2)
    a = jnp.abs(_rand((Cout,), 4, 0.25))
    res = _rand((F, H, H, Cout), 5, 0.5)

    fused = _FUSED[(True, True, True)]
    # fixed cotangent: isolates the backward path from the (bf16) forward
    # value delta — the bwd recomputes through the reference, so grads must
    # match the reference's to numerical noise
    ct = _rand((F, H, H, Cout), 6)

    def loss_fused(x_, w_):
        return jnp.sum(fused(1, 1, x_, w_, scale, bias, a, res).astype(jnp.float32) * ct)

    def loss_ref(x_, w_):
        return jnp.sum(_reference_conv(x_, w_, 1, 1, scale, bias, a, res).astype(jnp.float32) * ct)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=1e-3, rtol=1e-3)


def test_bn_fold_matches_batch_norm_inference():
    from omni_avsr_tpu.ops.norms import batch_norm_inference

    C = 16
    p = {"scale": _rand((C,), 0) + 1.0, "bias": _rand((C,), 1),
         "mean": _rand((C,), 2), "var": jnp.abs(_rand((C,), 3)) + 0.5}
    x = _rand((2, 4, 4, C), 4)
    s, b = bn_fold(p)
    np.testing.assert_allclose(
        np.asarray(x * s + b),
        np.asarray(batch_norm_inference(x, p["scale"], p["bias"], p["mean"], p["var"], 1e-5)),
        atol=1e-4, rtol=1e-4)


def test_frame_padding_path():
    """F not divisible by the block size exercises the pad/slice path."""
    x = _rand((3, 6, 6, 8), 0).astype(jnp.bfloat16)
    w = _rand((3, 3, 8, 8), 1, 0.2)
    ref = _reference_conv(x, w, 1, 1, None, None, None, None)
    out = conv2d_fused_pallas(x, w, 1, 1, None, None, None, None,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.1, rtol=0.05)
