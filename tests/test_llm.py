"""LLM decoder unit tests: shapes, LoRA routing, loss, KV-cache decode
consistency, and tp/dp sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omni_avsr_tpu.config import LLMConfig, LoRAConfig
from omni_avsr_tpu.models import llm as L
from omni_avsr_tpu.parallel.partitioning import llm_partition_specs, shard_params
from omni_avsr_tpu.parallel.mesh import batch_sharding


def tiny_cfg(task_specific=True, shared=False, family="llama"):
    return LLMConfig(
        family=family,
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        rope_scaling_factor=32.0 if family == "llama" else None,
        attention_bias=(family == "qwen"),
        tie_word_embeddings=True,
        lora=LoRAConfig(rank_divisor=8, alpha=4, task_specific=task_specific,
                        shared=shared, v_out_divisor=2),
    )


def test_forward_shapes_and_loss():
    cfg = tiny_cfg()
    params = L.init_llm(jax.random.PRNGKey(0), cfg)
    B, T = 2, 12
    embeds = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.hidden_size), jnp.float32)
    logits = L.llm_logits(params, cfg, embeds, modality="audio", remat=False)
    assert logits.shape == (B, T, cfg.vocab_size)
    labels = jnp.where(
        jnp.arange(T)[None] < 4, L.IGNORE_INDEX,
        jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, cfg.vocab_size),
    )
    loss = L.llm_loss(params, cfg, embeds, labels, modality="audio", remat=False)
    assert loss.shape == () and jnp.isfinite(loss)
    # roughly ln(V) at random init (LoRA downs are zero => base model)
    assert abs(float(loss) - np.log(cfg.vocab_size)) < 2.0


def test_lora_zero_init_is_identity():
    """down=0 at init => task-specific adapters all produce identical logits."""
    cfg = tiny_cfg()
    params = L.init_llm(jax.random.PRNGKey(0), cfg)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.hidden_size), jnp.float32)
    outs = [
        L.llm_logits(params, cfg, embeds, modality=m, remat=False)
        for m in ("audio", "video", "audiovisual")
    ]
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-6)


def test_lora_modality_routing():
    """Perturb only the 'video' adapter -> only video logits change."""
    cfg = tiny_cfg()
    params = L.init_llm(jax.random.PRNGKey(0), cfg)
    params["layers"]["lora"]["video"]["down_q"]["w"] = (
        params["layers"]["lora"]["video"]["down_q"]["w"] + 0.1
    )
    embeds = jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.hidden_size), jnp.float32)
    a = L.llm_logits(params, cfg, embeds, modality="audio", remat=False)
    v = L.llm_logits(params, cfg, embeds, modality="video", remat=False)
    assert not np.allclose(a, v)


def test_shared_lora_adds():
    cfg = tiny_cfg(shared=True)
    params = L.init_llm(jax.random.PRNGKey(0), cfg)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.hidden_size), jnp.float32)
    base = L.llm_logits(params, cfg, embeds, modality="audio", remat=False)
    params["layers"]["lora_shared"]["down_q"]["w"] = (
        params["layers"]["lora_shared"]["down_q"]["w"] + 0.1
    )
    pert = L.llm_logits(params, cfg, embeds, modality="audio", remat=False)
    assert not np.allclose(base, pert)


def test_qwen_variant_runs():
    cfg = tiny_cfg(family="qwen")
    params = L.init_llm(jax.random.PRNGKey(0), cfg)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 5, cfg.hidden_size), jnp.float32)
    logits = L.llm_logits(params, cfg, embeds, modality="audiovisual", remat=False)
    assert logits.shape == (2, 5, cfg.vocab_size)


def test_kv_cache_matches_full_forward():
    """Greedy decode via prefill+steps == argmax of the full forward at each
    position, with a *padded* prefix (pad slots masked out of the cache)."""
    cfg = tiny_cfg(task_specific=False)
    params = L.init_llm(jax.random.PRNGKey(0), cfg)
    H = cfg.hidden_size
    true_len, pad_to, n_new = 5, 8, 3
    rng = jax.random.PRNGKey(3)
    prefix = jax.random.normal(rng, (1, true_len, H), jnp.float32)
    prefix_padded = jnp.pad(prefix, ((0, 0), (0, pad_to - true_len), (0, 0)))
    prefix_len = jnp.array([true_len], jnp.int32)

    cache = L.KVCache.create(cfg, 1, pad_to + n_new, dtype=jnp.float32)
    logits0, cache = L.llm_prefill(params, cfg, prefix_padded, prefix_len, cache)

    # incremental: feed embeddings of greedy tokens
    toks = [int(jnp.argmax(logits0[0]))]
    seq_embeds = prefix
    for step in range(n_new - 1):
        te = L.embed_tokens(params, jnp.array([[toks[-1]]]), dtype=jnp.float32)
        logits, cache = L.llm_decode_step(
            params, cfg, te, jnp.int32(step), prefix_len, pad_to, cache
        )
        toks.append(int(jnp.argmax(logits[0])))

    # reference: full forward over the unpadded sequence
    ref_toks = []
    seq = prefix
    for _ in range(n_new):
        logits = L.llm_logits(params, cfg, seq, remat=False)
        nxt = int(jnp.argmax(logits[0, -1]))
        ref_toks.append(nxt)
        te = L.embed_tokens(params, jnp.array([[nxt]]), dtype=jnp.float32)
        seq = jnp.concatenate([seq, te], axis=1)

    assert toks == ref_toks[: len(toks)]


def test_fsdp_sharded_forward(mesh8):
    """FSDP specs (params sharded over dp too) produce identical logits."""
    cfg = tiny_cfg(task_specific=False)
    params = L.init_llm(jax.random.PRNGKey(0), cfg)
    B, T = 4, 8
    embeds = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.hidden_size), jnp.float32)
    expected = L.llm_logits(params, cfg, embeds, remat=False)
    specs = llm_partition_specs(params, fsdp=True)
    with mesh8:
        sharded = shard_params(mesh8, params, specs)
        embeds_s = jax.device_put(embeds, batch_sharding(mesh8))
        out = jax.jit(lambda p, e: L.llm_logits(p, cfg, e, remat=False))(sharded, embeds_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-4, rtol=2e-3)


def test_tp_dp_sharded_forward(mesh8):
    """Forward under a 4x2 (dp,tp) mesh matches single-device output."""
    cfg = tiny_cfg()
    params = L.init_llm(jax.random.PRNGKey(0), cfg)
    B, T = 4, 8
    embeds = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.hidden_size), jnp.float32)
    expected = L.llm_logits(params, cfg, embeds, modality="audio", remat=False)

    specs = llm_partition_specs(params)
    with mesh8:
        sharded = shard_params(mesh8, params, specs)
        embeds_s = jax.device_put(embeds, batch_sharding(mesh8))
        fn = jax.jit(lambda p, e: L.llm_logits(p, cfg, e, modality="audio", remat=False))
        out = fn(sharded, embeds_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-4, rtol=2e-3)
