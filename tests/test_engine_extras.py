"""Engine extras: tp-sharded decode parity, SNR-controlled eval noise,
device prefetch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.config import LLMConfig, LoRAConfig
from omni_avsr_tpu.decode.decoding import beam_search
from omni_avsr_tpu.models import llm as L
from omni_avsr_tpu.parallel.mesh import batch_sharding
from omni_avsr_tpu.parallel.partitioning import llm_partition_specs, shard_params


def test_tp_sharded_beam_decode(mesh8):
    """Beam decode under a tp-sharded mesh produces the same tokens."""
    cfg = LLMConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, lora=None,
    )
    params = L.init_llm(jax.random.PRNGKey(0), cfg)
    B, T, max_new = 2, 6, 5
    prefix = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 64), jnp.float32)
    plen = jnp.array([T, T], jnp.int32)

    expected = beam_search(
        params, cfg, prefix, plen, num_beams=3, max_new=max_new,
        eos_id=5, pad_id=0, cache_dtype=jnp.float32,
    )
    specs = llm_partition_specs(params)
    with mesh8:
        sharded = shard_params(mesh8, params, specs)
        out = jax.jit(
            lambda p, e, l: beam_search(
                p, cfg, e, l, num_beams=3, max_new=max_new,
                eos_id=5, pad_id=0, cache_dtype=jnp.float32,
            )
        )(sharded, prefix, plen)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expected))


def test_eval_snr_noise_applied():
    """decode_snr_target routes babble noise into eval preprocessing."""
    from omni_avsr_tpu.ops.augment import audio_pipeline
    from omni_avsr_tpu.data.noise import synth_babble

    audio = jnp.asarray(np.random.RandomState(0).randn(1, 8000).astype(np.float32))
    lens = jnp.array([8000])
    noise = jnp.asarray(synth_babble(seconds=2.0))
    clean = audio_pipeline(None, audio, lens, train=False)
    noisy = audio_pipeline(
        jax.random.PRNGKey(1), audio, lens, train=False,
        noise_bank=noise, snr_target=0.0,
    )
    assert not np.allclose(np.asarray(clean), np.asarray(noisy))
    # snr 999999 = clean path (reference default, `transforms.py:118-126`)
    clean2 = audio_pipeline(
        jax.random.PRNGKey(1), audio, lens, train=False,
        noise_bank=noise, snr_target=999999.0,
    )
    np.testing.assert_allclose(np.asarray(clean), np.asarray(clean2), atol=1e-6)


def test_device_prefetch_passthrough():
    from omni_avsr_tpu.utils.prefetch import device_prefetch

    batches = [
        {"x": np.ones((2, 3)), "gold_text": ["a"], "audio_trim_len": 25}
        for _ in range(5)
    ]
    out = list(device_prefetch(iter(batches), depth=2))
    assert len(out) == 5
    assert isinstance(out[0]["x"], jax.Array)
    assert out[0]["gold_text"] == ["a"]
    assert out[0]["audio_trim_len"] == 25
