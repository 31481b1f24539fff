"""int8 weight-only quantization: numerics, kernel parity, decode quality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.ops.quant import (
    dequantize,
    quantize_llm_params,
    quantize_per_channel,
    quantized_linear_xla,
    quantized_matmul,
)


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32) * 0.1
    q = quantize_per_channel(w)
    assert q["w"].dtype == jnp.int8
    err = np.abs(np.asarray(dequantize(q, jnp.float32)) - np.asarray(w))
    # per-channel symmetric int8: error bounded by scale/2 per channel
    bound = np.asarray(q["s"]) / 2.0 + 1e-6
    assert (err <= bound[None, :]).all()


def test_quantized_linear_xla_close():
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 96), jnp.float32) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 64), jnp.float32)
    q = quantize_per_channel(w)
    ref = x @ w
    out = quantized_linear_xla(x, q)
    rel = np.abs(np.asarray(out - ref)) / (np.abs(np.asarray(ref)) + 1e-3)
    assert rel.mean() < 0.02


def test_pallas_qmm_matches_xla():
    w = jax.random.normal(jax.random.PRNGKey(3), (256, 384), jnp.float32) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(4), (100, 256), jnp.float32)
    q = quantize_per_channel(w)
    ref = quantized_linear_xla(x, q)
    out = quantized_matmul(x, q, block_m=64, block_n=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=1e-2)


def test_quantized_llm_decode_matches_fp():
    """Greedy decode tokens survive int8 weight quantization on a tiny model
    with realistic weight scales."""
    from omni_avsr_tpu.config import LLMConfig
    from omni_avsr_tpu.decode.decoding import greedy_decode
    from omni_avsr_tpu.models import llm as L

    cfg = LLMConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, lora=None,
    )
    params = L.init_llm(jax.random.PRNGKey(0), cfg)
    qparams = quantize_llm_params(params)
    assert qparams["layers"]["attn"]["q"]["w"].dtype == jnp.int8
    assert qparams["lm_head"]["w"].dtype == jnp.int8  # tied -> int8 copy
    assert qparams["embed"]["w"].dtype != jnp.int8  # lookups stay float

    prefix = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64), jnp.float32) * 0.5
    plen = jnp.array([6, 6], jnp.int32)
    fp = greedy_decode(params, cfg, prefix, plen, max_new=6, eos_id=5, pad_id=0,
                       cache_dtype=jnp.float32)
    q8 = greedy_decode(qparams, cfg, prefix, plen, max_new=6, eos_id=5, pad_id=0,
                       cache_dtype=jnp.float32)
    # int8 is lossy; demand >= 80% token agreement on random weights
    agree = (np.asarray(fp) == np.asarray(q8)).mean()
    assert agree >= 0.8, agree


def test_quantize_tower_params_structure_and_numerics():
    """Tower quantization hits only the stacked layer matrices: convs,
    pos-conv, norms, and LoRA stay float; encode output stays close."""
    import numpy as np

    from omni_avsr_tpu.config import AVHubertConfig
    from omni_avsr_tpu.models.avhubert import avhubert_encode, init_avhubert
    from omni_avsr_tpu.ops.quant import quantize_tower_params

    cfg = AVHubertConfig(encoder_layers=2, encoder_embed_dim=64,
                         encoder_heads=4, encoder_ffn_dim=128,
                         lora_rank_divisor=16)
    p = init_avhubert(jax.random.PRNGKey(0), cfg)
    q = quantize_tower_params(p)
    assert q["layers"]["attn"]["q"]["w"].dtype == jnp.int8
    assert "s" in q["layers"]["attn"]["q"]
    assert q["layers"]["fc1"]["w"].dtype == jnp.int8
    # conv frontends / pos-conv / lora untouched
    assert q["pos_conv"]["w"].dtype == p["pos_conv"]["w"].dtype
    assert q["layers"]["lora"]["down_q"]["w"].dtype != jnp.int8
    video = jnp.asarray(np.random.RandomState(1).rand(1, 8, 88, 88, 1)
                        .astype(np.float32))
    a = avhubert_encode(p, cfg, video)
    b = avhubert_encode(q, cfg, video)
    rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
    assert rel < 0.02
