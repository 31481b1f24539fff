"""Decode parity vs HF transformers generate(): converter + forward +
greedy + beam search, at identical weights on a tiny random Llama."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.config import LLMConfig
from omni_avsr_tpu.convert.llm_torch import convert_llm
from omni_avsr_tpu.decode.decoding import beam_search, greedy_decode
from omni_avsr_tpu.models import llm as L

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        rms_norm_eps=1e-5,
        rope_theta=500000.0,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 32.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        },
        tie_word_embeddings=True,
        attention_bias=False,
        max_position_embeddings=2048,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg = LLMConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, rope_theta=500000.0,
        rope_scaling_factor=32.0, tie_word_embeddings=True, lora=None,
    )
    params = convert_llm(hf.state_dict(), cfg, dtype=jnp.float32)
    return hf, cfg, params


def test_forward_parity(tiny_pair):
    hf, cfg, params = tiny_pair
    rng = np.random.RandomState(1)
    embeds = rng.randn(2, 10, 64).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.from_numpy(embeds)).logits.numpy()
    ours = np.asarray(L.llm_logits(params, cfg, jnp.asarray(embeds), remat=False))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_loss_parity(tiny_pair):
    hf, cfg, params = tiny_pair
    rng = np.random.RandomState(2)
    embeds = rng.randn(2, 8, 64).astype(np.float32) * 0.5
    labels = rng.randint(0, 128, (2, 8))
    labels[:, :3] = -100
    with torch.no_grad():
        ref = hf(
            inputs_embeds=torch.from_numpy(embeds), labels=torch.from_numpy(labels)
        ).loss.item()
    ours = float(
        L.llm_loss(params, cfg, jnp.asarray(embeds), jnp.asarray(labels), remat=False)
    )
    assert abs(ours - ref) < 2e-4, (ours, ref)


def _hf_generate(hf, embeds, *, num_beams, max_new, eos_id, pad_id):
    with torch.no_grad():
        out = hf.generate(
            inputs_embeds=torch.from_numpy(embeds),
            max_new_tokens=max_new,
            num_beams=num_beams,
            do_sample=False,
            eos_token_id=eos_id,
            pad_token_id=pad_id,
            length_penalty=1.0,
            early_stopping=False,
        )
    return out.numpy()


def _compare(ours, ref, eos_id, pad_id, max_new):
    """Compare per-row: HF pads with pad_id and may include the EOS; ours
    stores pad after content (greedy keeps EOS, beam drops it)."""
    for o_row, r_row in zip(np.asarray(ours), ref):
        r = [t for t in r_row.tolist() if t != pad_id]
        o = [t for t in o_row.tolist() if t != pad_id]
        r_core = r[:-1] if (r and r[-1] == eos_id) else r
        o_core = o[:-1] if (o and o[-1] == eos_id) else o
        assert o_core == r_core, (o, r)


def test_greedy_parity(tiny_pair):
    hf, cfg, params = tiny_pair
    rng = np.random.RandomState(3)
    B, T, max_new = 2, 7, 8
    eos_id, pad_id = 5, 0
    embeds = rng.randn(B, T, 64).astype(np.float32) * 0.5
    ref = _hf_generate(hf, embeds, num_beams=1, max_new=max_new, eos_id=eos_id, pad_id=pad_id)

    # our prefix is padded to P=8 with true length 7
    P = 8
    padded = np.zeros((B, P, 64), np.float32)
    padded[:, :T] = embeds
    ours = greedy_decode(
        params, cfg, jnp.asarray(padded), jnp.full((B,), T, jnp.int32),
        max_new=max_new, eos_id=eos_id, pad_id=pad_id, cache_dtype=jnp.float32,
    )
    _compare(ours, ref, eos_id, pad_id, max_new)


def test_masked_prefix_equals_compact(tiny_pair):
    """A prefix with interior gaps (key_valid) must decode exactly like the
    compacted sequence — the mechanism behind per-sample trim in batched
    decode."""
    hf, cfg, params = tiny_pair
    rng = np.random.RandomState(7)
    D, max_new, eos_id, pad_id = 64, 6, 5, 0
    # two samples: token slots [bos][feat x 4][tail x 2] with per-sample
    # valid feature counts 4 and 2
    feats = rng.randn(2, 7, D).astype(np.float32) * 0.5
    valid = np.ones((2, 7), bool)
    valid[1, 3:5] = False  # sample 1: gaps in the middle

    masked = greedy_decode(
        params, cfg, jnp.asarray(feats), max_new=max_new, eos_id=eos_id,
        pad_id=pad_id, key_valid=jnp.asarray(valid), cache_dtype=jnp.float32,
    )
    masked_beam = beam_search(
        params, cfg, jnp.asarray(feats), num_beams=3, max_new=max_new,
        eos_id=eos_id, pad_id=pad_id, key_valid=jnp.asarray(valid),
        cache_dtype=jnp.float32,
    )
    for b in range(2):
        compact = feats[b][valid[b]][None]  # (1, n_valid, D)
        ref = greedy_decode(
            params, cfg, jnp.asarray(compact), jnp.array([compact.shape[1]]),
            max_new=max_new, eos_id=eos_id, pad_id=pad_id, cache_dtype=jnp.float32,
        )
        np.testing.assert_array_equal(np.asarray(masked)[b], np.asarray(ref)[0])
        ref_beam = beam_search(
            params, cfg, jnp.asarray(compact), jnp.array([compact.shape[1]]),
            num_beams=3, max_new=max_new, eos_id=eos_id, pad_id=pad_id,
            cache_dtype=jnp.float32,
        )
        np.testing.assert_array_equal(np.asarray(masked_beam)[b], np.asarray(ref_beam)[0])


def test_beam_no_repeat_ngram(tiny_pair):
    """no_repeat_ngram_size parity vs HF generate."""
    hf, cfg, params = tiny_pair
    rng = np.random.RandomState(11)
    B, T, max_new, eos_id, pad_id = 1, 5, 10, 999, 0  # eos unused -> full length
    embeds = rng.randn(B, T, 64).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = hf.generate(
            inputs_embeds=torch.from_numpy(embeds), max_new_tokens=max_new,
            num_beams=3, do_sample=False, eos_token_id=eos_id, pad_token_id=pad_id,
            length_penalty=1.0, early_stopping=False, no_repeat_ngram_size=2,
        ).numpy()
    P = 8
    padded = np.zeros((B, P, 64), np.float32)
    padded[:, :T] = embeds
    ours = beam_search(
        params, cfg, jnp.asarray(padded), jnp.full((B,), T, jnp.int32),
        num_beams=3, max_new=max_new, eos_id=eos_id, pad_id=pad_id,
        no_repeat_ngram_size=2, cache_dtype=jnp.float32,
    )
    _compare(ours, ref, eos_id, pad_id, max_new)
    # and the output truly has no repeated bigram
    row = [t for t in np.asarray(ours)[0].tolist() if t != pad_id]
    bigrams = list(zip(row[:-1], row[1:]))
    assert len(bigrams) == len(set(bigrams))


@pytest.mark.parametrize("num_beams,max_new,eos_id", [(4, 6, 5), (3, 10, 7)])
def test_beam_parity(tiny_pair, num_beams, max_new, eos_id):
    hf, cfg, params = tiny_pair
    rng = np.random.RandomState(4 + num_beams)
    B, T = 2, 6
    pad_id = 0
    embeds = rng.randn(B, T, 64).astype(np.float32) * 0.5
    ref = _hf_generate(
        hf, embeds, num_beams=num_beams, max_new=max_new, eos_id=eos_id, pad_id=pad_id
    )
    P = 8
    padded = np.zeros((B, P, 64), np.float32)
    padded[:, :T] = embeds
    ours = beam_search(
        params, cfg, jnp.asarray(padded), jnp.full((B,), T, jnp.int32),
        num_beams=num_beams, max_new=max_new, eos_id=eos_id, pad_id=pad_id,
        cache_dtype=jnp.float32,
    )
    _compare(ours, ref, eos_id, pad_id, max_new)


def test_topk_chunked_exact():
    """topk_chunked == lax.top_k on long rows: random, adversarial (all
    top-k inside one chunk), non-divisible V (pad path)."""
    from omni_avsr_tpu.decode.decoding import topk_chunked

    rng = np.random.RandomState(0)
    for V in (70000, 70001):  # divisible / pad path (chunk=128 | 70000? no)
        x = rng.randn(3, 5, V).astype(np.float32)
        # adversarial: plant the global top 8 all inside one chunk
        x[0, 0, 1000:1008] = 100.0 + np.arange(8)
        xj = jnp.asarray(x)
        vals, idx = topk_chunked(xj, 8)
        rv, ri = jax.lax.top_k(xj, 8)
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))
    # small rows fall through to plain top_k
    x = jnp.asarray(rng.randn(4, 50).astype(np.float32))
    vals, idx = topk_chunked(x, 3)
    rv, ri = jax.lax.top_k(x, 3)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))
