"""Intra-step breakdown of the beam-decode LLM step at serving shapes.

`decode_breakdown.py` splits the e2e decode into encode/prefill/llm-steps/
selection; this drills into ONE `llm_decode_step_beam` call — the dominant
serving stage (ledger: 23 ms/step at batch 32 x beam 15) — by timing probe
variants built from the same private building blocks:

  full       llm_decode_step_beam (16-layer scan + lm_head), the real step
  matmuls    same scan body with the attention read stubbed out (q.mean into
             the residual): weight-stream + norms + LoRA cost
  attention  per-layer two-block beam attention only (scan over cached K/V,
             q projected fresh each layer so the probe has a per-layer data
             dependency)
  lm_head    final-norm + (int8) unembedding on (B*K, 1, H)
  reorder    SplitCache.reorder — the per-step gen-region gather
  embed      token embed lookup (B*K,) -> (B*K, 1, H)

Each probe runs as an on-device chained `fori_loop` (one sync, value
fetched — axon relay rules, utils/profiling.py) and prints ms/step next to
its analytic roofline: int8 weight bytes for `matmuls`, K/V bytes for
`attention`/`reorder`, unembed bytes+FLOPs for `lm_head`.

  python benchmarks/llm_step_breakdown.py [batch] [beams] [prefix] [bf16]

Env: OMNI_BREAKDOWN_TINY=1 for a CPU wiring smoke.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 819.0  # v5e
PEAK_TFLOPS = 197.0  # bf16


def _timed(fn, args, n=200):
    # n must be large: the dev relay adds a ~32 ms round-trip per fetch, so
    # ms/step carries a +32/n additive floor (n=20 inflated every stage by
    # ~1.6 ms and made a copy-only pallas kernel look like a 2 ms launch)
    @jax.jit
    def run(*a):
        def body(i, acc):
            return acc + fn(i, acc, *a)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(*args))  # compile + sync
    t0 = time.perf_counter()
    float(run(*args))
    dt = time.perf_counter() - t0
    return dt / n * 1e3


def _tree_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "dtype"))


def main():
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship
    from omni_avsr_tpu.models.llm import (
        SplitCache,
        _merged_beam_attention,
        _mlp_block,
        _qkv_with_lora,
        apply_rope,
        lm_head,
        linear,
        llm_decode_step_beam,
        rms_norm,
        rope_cos_sin,
    )
    from omni_avsr_tpu.ops.quant import quantize_decode_params
    from omni_avsr_tpu.train.engine import OmniEngine
    from omni_avsr_tpu.config import TrainConfig

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 176
    use_int8 = "bf16" not in sys.argv[4:]
    N = 32  # max_new (reference decode config)

    model = _flagship(tiny=os.environ.get("OMNI_BREAKDOWN_TINY") == "1")
    params = model.init_params(jax.random.PRNGKey(0))
    engine = OmniEngine(model, params, TrainConfig(), 1.0, noise_bank=None,
                        inference_only=True)
    merged = engine.merged_params()
    if use_int8:
        merged = quantize_decode_params(merged)
    llm_params = merged["llm"]
    cfg = model.cfg.llm
    BK = B * K
    H = cfg.hidden_size
    modality = "audiovisual"

    rng = np.random.RandomState(0)
    token_embeds = jnp.asarray(rng.randn(BK, 1, H) * 0.02, jnp.bfloat16)
    n_valid = jnp.full((BK,), P - 8, jnp.int32)
    prefix_mask = jnp.arange(P)[None, :] < (P - 8)
    prefix_mask = jnp.broadcast_to(prefix_mask, (B, P))
    L = int(cfg.num_layers)
    Hkv, D = int(cfg.num_kv_heads), int(cfg.head_dim)
    cache = SplitCache(
        prefix_k=jnp.asarray(rng.randn(L, B, Hkv, P, D) * 0.1, jnp.bfloat16),
        prefix_v=jnp.asarray(rng.randn(L, B, Hkv, P, D) * 0.1, jnp.bfloat16),
        gen_k=jnp.asarray(rng.randn(BK, L, Hkv, N, D) * 0.1, jnp.bfloat16),
        gen_v=jnp.asarray(rng.randn(BK, L, Hkv, N, D) * 0.1, jnp.bfloat16),
    )
    step = jnp.int32(N // 2)
    flat_idx = jnp.asarray(
        rng.randint(0, K, size=(BK,)) + (np.arange(BK) // K) * K, jnp.int32)

    def chain(x, acc):
        return x + acc.astype(x.dtype) * jnp.asarray(1e-38, x.dtype)

    results = {}

    # --- full step ---------------------------------------------------------
    def full_probe(i, acc, p, emb, cch):
        logits, new_cache = llm_decode_step_beam(
            p, cfg, chain(emb, acc), step, n_valid, prefix_mask, cch, K,
            modality=modality)
        return jnp.sum(logits) * 1e-30 + jnp.sum(new_cache.gen_k[0, :, 0, 0, 0].astype(jnp.float32)) * 1e-30

    results["full"] = _timed(full_probe, (llm_params, token_embeds, cache))
    print("full done", results["full"], file=sys.stderr, flush=True)

    # --- matmuls only (attention stubbed) ----------------------------------
    def matmul_probe(i, acc, p, emb):
        x = chain(emb, acc)
        cos, sin = rope_cos_sin(cfg, (n_valid + step)[:, None].astype(jnp.int32))

        def body(h, layer):
            hn = rms_norm(h, layer["input_norm"]["scale"], cfg.rms_norm_eps)
            q, k, v = _qkv_with_lora(layer, cfg, hn, modality)
            q4 = q.reshape(BK, 1, cfg.num_heads, cfg.head_dim)
            k4 = k.reshape(BK, 1, cfg.num_kv_heads, cfg.head_dim)
            q4, k4 = apply_rope(q4, k4, cos, sin)
            # stub the cache read: fold q/k/v into a (BK,1,q_dim) pseudo-out
            out = q4.reshape(BK, 1, -1) + (jnp.mean(k4) + jnp.mean(v)) * 1e-3
            h = h + linear(out * 0.01, layer["attn"]["o"])
            h2 = rms_norm(h, layer["post_attn_norm"]["scale"], cfg.rms_norm_eps)
            return h + _mlp_block(layer, h2), None

        x, _ = jax.lax.scan(body, x, p["layers"])
        return jnp.sum(x.astype(jnp.float32)) * 1e-30

    results["matmuls"] = _timed(matmul_probe, (llm_params, token_embeds))
    print("matmuls done", results["matmuls"], file=sys.stderr, flush=True)

    # --- attention only ----------------------------------------------------
    qw = jnp.asarray(rng.randn(H, cfg.num_heads * D) * 0.02, jnp.bfloat16)
    gen_mask = jnp.arange(N) < step
    k_cur = jnp.asarray(rng.randn(BK, Hkv, D) * 0.1, jnp.bfloat16)
    v_cur = jnp.asarray(rng.randn(BK, Hkv, D) * 0.1, jnp.bfloat16)

    def attn_probe(i, acc, emb, cch):
        x = chain(emb, acc)
        q0 = (x @ qw).reshape(BK, 1, cfg.num_heads, D)

        def body(carry, layer_cache):
            pk, pv, l = layer_cache
            gk = jax.lax.dynamic_index_in_dim(cch.gen_k, l, axis=1, keepdims=False)
            gv = jax.lax.dynamic_index_in_dim(cch.gen_v, l, axis=1, keepdims=False)
            q = q0 + carry.reshape(BK, 1, cfg.num_heads, D)
            out = _merged_beam_attention(
                cfg, q, pk.astype(q.dtype), pv.astype(q.dtype),
                gk.astype(q.dtype), gv.astype(q.dtype), k_cur, v_cur,
                prefix_mask, gen_mask, K)
            return out.reshape(BK, -1) * 1e-3, None

        out, _ = jax.lax.scan(
            body, jnp.zeros((BK, cfg.num_heads * D), jnp.bfloat16),
            (cch.prefix_k, cch.prefix_v, jnp.arange(cch.gen_k.shape[1], dtype=jnp.int32)))
        return jnp.sum(out.astype(jnp.float32)) * 1e-30

    results["attention"] = _timed(attn_probe, (token_embeds, cache))
    print("attention done", results["attention"], file=sys.stderr, flush=True)

    # --- lm_head -----------------------------------------------------------
    def head_probe(i, acc, p, emb):
        logits = lm_head(p, cfg, chain(emb, acc))
        return jnp.sum(logits) * 1e-30

    results["lm_head"] = _timed(head_probe, (llm_params, token_embeds))
    print("lm_head done", results["lm_head"], file=sys.stderr, flush=True)

    # --- cache reorder -----------------------------------------------------
    def reorder_probe(i, acc, cch):
        idx = (flat_idx + i) % BK  # loop-dependent so the gather can't hoist
        nc = cch.reorder(idx)
        return jnp.sum(nc.gen_k[0, :, 0, 0, 0].astype(jnp.float32)) * 1e-30

    results["reorder"] = _timed(reorder_probe, (cache,))
    print("reorder done", results["reorder"], file=sys.stderr, flush=True)

    # --- rooflines ---------------------------------------------------------
    layer_bytes = _tree_bytes(llm_params["layers"])
    head_bytes = _tree_bytes(llm_params.get("lm_head", llm_params["embed"]))
    V = int(cfg.vocab_size)
    head_flops = 2.0 * BK * H * V
    kv_bytes = 2 * (L * B * P + L * BK * N) * Hkv * D * 2  # bf16 K+V read
    reorder_bytes = 2 * 2 * L * BK * N * Hkv * D * 2  # gather read+write K+V
    out = {
        "config": {"B": B, "K": K, "P": P, "N": N, "int8": use_int8},
        "ms": {k: round(v, 3) for k, v in results.items()},
        "roofline_ms": {
            "matmuls_weight_stream": round(layer_bytes / HBM_GBPS / 1e6, 3),
            "attention_kv_read": round(kv_bytes / HBM_GBPS / 1e6, 3),
            "lm_head_max(bytes,flops)": round(
                max(head_bytes / HBM_GBPS / 1e6,
                    head_flops / PEAK_TFLOPS / 1e9), 3),
            "reorder_gather": round(reorder_bytes / HBM_GBPS / 1e6, 3),
        },
        "bytes": {"layers": layer_bytes, "lm_head": head_bytes,
                  "kv_read_per_step": kv_bytes},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
