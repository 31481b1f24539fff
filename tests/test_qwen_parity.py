"""Qwen2 parity vs HF transformers at identical converted weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.config import LLMConfig
from omni_avsr_tpu.convert.llm_torch import convert_llm
from omni_avsr_tpu.decode.decoding import greedy_decode
from omni_avsr_tpu.models import llm as L

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def qwen_pair():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-6, rope_theta=1000000.0, tie_word_embeddings=True,
        max_position_embeddings=2048, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = LLMConfig(
        family="qwen", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        rms_norm_eps=1e-6, rope_theta=1000000.0, rope_scaling_factor=None,
        attention_bias=True, tie_word_embeddings=True, lora=None,
    )
    params = convert_llm(hf.state_dict(), cfg, dtype=jnp.float32)
    return hf, cfg, params


def test_qwen_forward_parity(qwen_pair):
    hf, cfg, params = qwen_pair
    embeds = np.random.RandomState(1).randn(2, 9, 64).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.from_numpy(embeds)).logits.numpy()
    ours = np.asarray(L.llm_logits(params, cfg, jnp.asarray(embeds), remat=False))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_qwen_greedy_parity(qwen_pair):
    hf, cfg, params = qwen_pair
    B, T, max_new, eos_id, pad_id = 2, 6, 7, 5, 0
    embeds = np.random.RandomState(2).randn(B, T, 64).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = hf.generate(
            inputs_embeds=torch.from_numpy(embeds), max_new_tokens=max_new,
            num_beams=1, do_sample=False, eos_token_id=eos_id, pad_token_id=pad_id,
        ).numpy()
    P = 8
    padded = np.zeros((B, P, 64), np.float32)
    padded[:, :T] = embeds
    ours = greedy_decode(
        params, cfg, jnp.asarray(padded), jnp.full((B,), T, jnp.int32),
        max_new=max_new, eos_id=eos_id, pad_id=pad_id, cache_dtype=jnp.float32,
    )
    from tests.test_decode import _compare

    _compare(ours, ref, eos_id, pad_id, max_new)
