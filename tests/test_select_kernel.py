"""One-pass selection-stats kernel (ops/select_topk.py): parity with the
XLA route, and the fused beam selection end-to-end on both routes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.decode.decoding import beam_loop, topk_chunked
from omni_avsr_tpu.ops.select_topk import (
    row_stats_chunkmax,
    select_stats_supported,
)


@pytest.mark.parametrize("R,V", [(15, 128256), (16, 128256), (7, 1280),
                                 (480, 16384)])
def test_row_stats_matches_xla(R, V):
    rng = np.random.RandomState(R + V)
    x = jnp.asarray(rng.randn(R, V).astype(np.float32) * 4)
    cm, mx, se = row_stats_chunkmax(x, interpret=True)
    C = V // 128
    xn = np.asarray(x)
    assert np.array_equal(np.asarray(cm), xn.reshape(R, C, 128).max(-1))
    assert np.array_equal(np.asarray(mx), xn.max(-1))
    np.testing.assert_allclose(
        np.asarray(se), np.exp(xn - xn.max(-1, keepdims=True)).sum(-1),
        rtol=1e-6)


def test_supported_vocabs():
    assert select_stats_supported(128256)  # llama-3
    assert select_stats_supported(151936)  # qwen-2.5
    assert select_stats_supported(16384)
    assert not select_stats_supported(254)  # not 128-aligned
    assert not select_stats_supported(262144)  # (8, V) block exceeds VMEM


def test_topk_chunked_with_precomputed_maxima_and_recursion():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 15, 128256).astype(np.float32))
    cm = jnp.max(x.reshape(2, 15, -1, 128), axis=-1)
    vals, idx = topk_chunked(x, 30, chunk_maxima=cm)
    ref_v, ref_i = jax.lax.top_k(x, 30)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))


def test_topk_chunked_recursion_adversarial():
    """All true top-k packed into one chunk — the recursive finish must
    still return the exact flat-row top-k."""
    rng = np.random.RandomState(4)
    x = rng.randn(1, 1, 128256).astype(np.float32)
    x[0, 0, 5000:5030] += 100.0  # one 128-chunk holds the entire top-30
    x = jnp.asarray(x)
    vals, idx = topk_chunked(x, 30)
    ref_v, ref_i = jax.lax.top_k(x, 30)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))


def _run_beam(select_kernel, W, K=4, V=16384, max_new=6, B=2):
    """Tiny synthetic decoder: per-step logits depend on the chosen tokens
    so the two routes must agree step-by-step to agree at the end."""

    def step_fn(state, new_tok, flat_idx, t):
        # deterministic token-dependent logits
        base = W[t]  # (V,)
        shift = (new_tok[..., None].astype(jnp.float32) % 97) * 0.013
        return base[None, None, :] + shift, state

    return beam_loop(
        init_logits=jnp.broadcast_to(W[0][None], (B, W.shape[1])),
        state=(),
        step_fn=step_fn,
        num_beams=K, vocab_size=V, max_new=max_new,
        eos_id=1, pad_id=0, select_kernel=select_kernel,
    )


def test_beam_loop_kernel_route_token_identity():
    rng = np.random.RandomState(11)
    W = jnp.asarray(rng.randn(8, 16384).astype(np.float32) * 2)
    ids_xla = np.asarray(_run_beam(False, W))
    ids_kernel = np.asarray(_run_beam(True, W))
    np.testing.assert_array_equal(ids_kernel, ids_xla)
