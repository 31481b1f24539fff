"""Fused beam-decode attention kernel (ancestor route) vs the XLA route.

`ops/beam_attention.py` computes the split-cache three-block attention
(shared prefix | per-beam generated | current token) over an UNPERMUTED
gen cache plus an ancestor table; these tests pin it against
`models/llm.py::_merged_beam_attention` run on the equivalent physically
reordered cache (the XLA route, itself parity-tested transitively through
the HF beam-search tests), in interpret mode on CPU. A route-level test
then checks full beam decode emits identical tokens under both routes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.config import LLMConfig
from omni_avsr_tpu.models.llm import NEG_INF, _merged_beam_attention
from omni_avsr_tpu.ops.beam_attention import beam_decode_attention


def _case(B, K, Hq, Hkv, D, P, N, step, seed=0):
    rng = np.random.RandomState(seed)
    BK = B * K
    q = jnp.asarray(rng.randn(BK, 1, Hq, D), jnp.float32)
    pk = jnp.asarray(rng.randn(B, Hkv, P, D), jnp.float32)
    pv = jnp.asarray(rng.randn(B, Hkv, P, D), jnp.float32)
    gk = jnp.asarray(rng.randn(B, Hkv, K, N, D), jnp.float32)
    gv = jnp.asarray(rng.randn(B, Hkv, K, N, D), jnp.float32)
    kc = jnp.asarray(rng.randn(BK, Hkv, D), jnp.float32)
    vc = jnp.asarray(rng.randn(BK, Hkv, D), jnp.float32)
    prefix_mask = jnp.asarray(rng.rand(B, P) < 0.7)
    prefix_mask = prefix_mask.at[:, 0].set(True)
    # random but valid ancestry: row for (k, n) is any row in [0, K)
    anc = jnp.asarray(rng.randint(0, K, size=(B, K, N)), jnp.int32)
    return q, pk, pv, gk, gv, kc, vc, prefix_mask, anc


def _reference(cfg, q, pk, pv, gk, gv, kc, vc, prefix_mask, anc, step, K):
    """XLA route on the physically-reordered equivalent of (gk, anc):
    reordered[b, h, k, n] = gk[b, h, anc[b, k, n], n]."""
    B, Hkv, _, N, D = gk.shape
    b_idx = jnp.arange(B)[:, None, None]
    n_idx = jnp.arange(N)[None, None, :]
    def gather(x):
        # (B, K, N, Hkv, D) -> (B*K, Hkv, N, D): per-beam ancestor rows
        g = x.transpose(0, 2, 3, 1, 4)[b_idx, anc, n_idx]  # (B, K, N, Hkv, D)
        return g.transpose(0, 1, 3, 2, 4).reshape(B * anc.shape[1], Hkv, N, D)
    gen_mask = jnp.arange(N) < step
    return _merged_beam_attention(cfg, q, pk, pv, gather(gk), gather(gv),
                                  kc, vc, prefix_mask, gen_mask, K)


@pytest.mark.parametrize(
    "B,K,Hq,Hkv,D,P,N,step",
    [
        (2, 3, 8, 4, 64, 16, 8, 4),     # GQA g=2
        (1, 15, 32, 8, 64, 48, 32, 0),  # flagship-ish geometry, step 0
        (2, 2, 4, 4, 64, 16, 8, 7),     # MHA, last slot live
        (1, 5, 10, 2, 64, 24, 16, 3),   # K*G=25 -> padded rows exercised
        (3, 1, 8, 4, 64, 16, 8, 5),     # K=1: greedy reuses this kernel
    ],
)
def test_kernel_matches_xla_route(B, K, Hq, Hkv, D, P, N, step):
    q, pk, pv, gk, gv, kc, vc, prefix_mask, anc = _case(B, K, Hq, Hkv, D, P, N, step)
    cfg = LLMConfig(num_heads=Hq, num_kv_heads=Hkv, head_dim=D)
    ref = _reference(cfg, q, pk, pv, gk, gv, kc, vc, prefix_mask, anc, step, K)
    bias = jnp.where(prefix_mask, 0.0, NEG_INF).astype(jnp.float32)
    out = beam_decode_attention(q, pk, pv, gk, gv, kc, vc, bias, anc,
                                jnp.int32(step), K, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_matches_under_jit_with_traced_step():
    """step arrives as a traced loop variable in the real decode loop."""
    B, K, Hq, Hkv, D, P, N = 1, 3, 8, 4, 64, 16, 8
    q, pk, pv, gk, gv, kc, vc, prefix_mask, anc = _case(B, K, Hq, Hkv, D, P, N, 0)
    cfg = LLMConfig(num_heads=Hq, num_kv_heads=Hkv, head_dim=D)
    bias = jnp.where(prefix_mask, 0.0, NEG_INF).astype(jnp.float32)

    @jax.jit
    def run(step):
        return beam_decode_attention(q, pk, pv, gk, gv, kc, vc, bias, anc,
                                     step, K, interpret=True)

    for s in (0, 3, 7):
        ref = _reference(cfg, q, pk, pv, gk, gv, kc, vc, prefix_mask, anc,
                         s, K)
        np.testing.assert_allclose(np.asarray(run(jnp.int32(s))),
                                   np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_beam_search_routes_agree(monkeypatch):
    """Full beam decode: kernel route (ancestor cache, no reorder) emits
    the same tokens as the XLA route (physical reorder) on a tiny trained-
    geometry model. Route forced via OMNI_BEAM_ATTN=kernel; on CPU the
    kernel runs in interpret mode."""
    import sys
    sys.path.insert(0, "tests")
    from test_omni import tiny_omni
    from omni_avsr_tpu.serve import Transcriber

    model = tiny_omni()
    params = model.init_params(jax.random.PRNGKey(0),
                               frozen_dtype=jnp.float32)
    rng = np.random.RandomState(3)
    audio = (rng.randn(24000) * 0.1).astype(np.float32)
    video = rng.randint(0, 255, (40, 96, 96, 3), dtype=np.uint8)

    ref = Transcriber(model, params, num_beams=3, max_new_tokens=6)
    hyp_xla = ref.transcribe(audio=audio, video=video)
    monkeypatch.setenv("OMNI_BEAM_ATTN", "kernel")
    kern = Transcriber(model, params, num_beams=3, max_new_tokens=6)
    assert kern.transcribe(audio=audio, video=video) == hyp_xla
