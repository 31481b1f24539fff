"""Fused decode projections (q|k|v, gate|up concatenation, ops/quant.py):
bit-exact token identity vs the unfused tree, int8 and bf16, llama + qwen
layouts (the qwen leg carries qkv biases through the concat)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.config import LLMConfig, LoRAConfig
from omni_avsr_tpu.decode.decoding import beam_search, greedy_decode
from omni_avsr_tpu.models import llm as L
from omni_avsr_tpu.ops.quant import (
    fuse_decode_projections,
    quantize_decode_params,
)


def _cfg(family):
    return LLMConfig(
        family=family, vocab_size=254, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        rope_scaling_factor=32.0 if family == "llama" else None,
        attention_bias=(family == "qwen"),
        lora=LoRAConfig(rank_divisor=8, alpha=4, task_specific=True,
                        v_out_divisor=2),
    )


@pytest.mark.parametrize("family", ["llama", "qwen"])
@pytest.mark.parametrize("int8", [True, False])
def test_fused_projection_token_identity(family, int8):
    cfg = _cfg(family)
    params = L.init_llm(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(2)
    prefix = jnp.asarray(rng.randn(2, 12, 64).astype(np.float32) * 0.3)
    plen = jnp.asarray([12, 9], jnp.int32)

    if int8:
        base = quantize_decode_params({"llm": params},
                                      fuse_projections=False)["llm"]
        fused = quantize_decode_params({"llm": params},
                                       fuse_projections=True)["llm"]
    else:
        base = params
        fused = fuse_decode_projections(params)

    assert "qkv" in fused["layers"]["attn"] and "q" not in fused["layers"]["attn"]
    assert "gateup" in fused["layers"]["mlp"] and "gate" not in fused["layers"]["mlp"]

    for fn in (
        lambda p: greedy_decode(p, cfg, prefix, plen, max_new=6, eos_id=1,
                                pad_id=0, modality="audio"),
        lambda p: beam_search(p, cfg, prefix, plen, num_beams=3, max_new=6,
                              eos_id=1, pad_id=0, modality="audio"),
    ):
        np.testing.assert_array_equal(np.asarray(fn(fused)),
                                      np.asarray(fn(base)))
