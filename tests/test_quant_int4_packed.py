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


@pytest.mark.slow
def test_int4_packed_decode_matches_emulation(tmp_path):
    """The packed runtime (`quantize_for_decode(..., "int4")` -> Pallas
    nibble kernel via models/common.linear) must transcribe like the
    int4-RTN int8-container emulation (`quantize_decode_params(bits=4)`)
    that the scaled WER probe gates — same RTN values, only the container
    and matmul route differ."""
    import jax as _jax

    from omni_avsr_tpu.cli.train_omni import parse_args
    from omni_avsr_tpu.cli.common import (
        build_data_config, build_model, maybe_synthetic,
    )
    from omni_avsr_tpu.config import TrainConfig
    from omni_avsr_tpu.data.datamodule import DataModule
    from omni_avsr_tpu.ops.quant import (
        quantize_decode_params, quantize_for_decode,
    )
    from omni_avsr_tpu.train.engine import OmniEngine

    args = parse_args([
        "--synthetic", "4", "--exp-dir", str(tmp_path), "--max-epochs", "1",
        "--num-beams", "2", "--max-dec-tokens", "6",
        "--downsample-ratio-audio", "4", "--downsample-ratio-video", "2",
    ])
    maybe_synthetic(args)
    model = build_model(args)
    params = model.init_params(_jax.random.PRNGKey(0))
    data_cfg = build_data_config(args)
    dm = DataModule(data_cfg, model.tok, modality="audiovisual")
    engine = OmniEngine(model, params, TrainConfig(lr=3e-3), 4.0, seed=0)
    for _ in range(2):
        for batch in dm.train_batches(0):
            engine.train_step(batch)

    merged = engine.merged_params()
    emul = quantize_decode_params(merged, bits=4)
    packed = quantize_for_decode(merged, "int4")

    hyps = {"emul": [], "packed": []}
    for batch in dm.test_batches(1):
        for name, p in (("emul", emul), ("packed", packed)):
            hyps[name].extend(engine.decode_batch(
                p, batch, "audiovisual", 4, 2, num_beams=2, max_new=6))
    agree = np.mean([a == b for a, b in zip(hyps["emul"], hyps["packed"])])
    assert agree >= 0.5, (agree, hyps)  # fp-route differences only


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
