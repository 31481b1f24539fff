"""Packed-int4 weight matmul (`ops/quant.py::pack_int4 / quantized_matmul4`).

The uint8 nibble container is the relay-safe int4 runtime (no S4 buffers —
PARITY.md int4 note): numerics must be IDENTICAL to the int4-RTN emulation
(`quantize_per_channel(bits=4)` in an int8 container) that the scaled WER
probe studies, so the WER evidence transfers to this kernel unchanged.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.ops.quant import (
    dequantize,
    pack_int4,
    quantize_per_channel,
    quantized_matmul4,
)


def _unpack(q4):
    """Reference unpack back to the int8 container layout (low half-byte
    offset-binary lo+8, high half-byte signed — see pack_int4)."""
    g = np.asarray(q4["w4"]).astype(np.uint8).astype(np.int32)
    K = g.shape[0]
    lo = (g & 0xF) - 8
    hi = ((g >> 4) ^ 8) - 8  # sign-extend the 4-bit high field
    out = np.stack([lo, hi], axis=2).reshape(K, -1)
    return out[:, : int(q4["s"].shape[-1])]


@pytest.mark.parametrize("shape", [(64, 512), (96, 612), (32, 256)])
def test_pack_roundtrip_exact(shape):
    K, N = shape
    rng = np.random.RandomState(0)
    q = quantize_per_channel(jnp.asarray(rng.randn(K, N), jnp.float32), bits=4)
    q4 = pack_int4(q, block_n=256)
    np.testing.assert_array_equal(_unpack(q4), np.asarray(q["w"]))


@pytest.mark.parametrize("m,k,n", [(1, 128, 256), (5, 96, 612), (16, 256, 300)])
def test_matmul4_matches_int4_rtn_dequant(m, k, n):
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(k, n), jnp.float32)
    x = jnp.asarray(rng.randn(m, k), jnp.float32).astype(jnp.bfloat16)
    q = quantize_per_channel(w, bits=4)
    ref = x.astype(jnp.float32) @ dequantize(q, jnp.float32)
    out = quantized_matmul4(x, pack_int4(q, block_n=256),
                            block_m=8, block_k=64, interpret=True)
    rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
                / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert rel < 2e-2, rel  # bf16 dot vs f32 reference
