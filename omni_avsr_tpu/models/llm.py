"""Decoder-only LLM (Llama-3.x / Qwen-2.5) with Omni-LoRA adapters.

TPU-first re-design of the reference's `Omni_AVSR/Llama_LoRA.py` and
`Omni_AVSR/Qwen_LoRA.py` (which subclass HF transformers internals):

  - One unified implementation; family differences (attention bias, rope
    scaling, norm eps) live in `LLMConfig`.
  - Layers are stacked on a leading axis and executed with `lax.scan`
    (fast compile, identical math) with optional per-layer remat.
  - GQA is folded into the attention einsum — no materialised `repeat_kv`.
  - The `modality` routing of task-specific LoRA
    (`Llama_LoRA.py:124-169, 250-259`) is a *static* argument: each task
    forward is traced with its adapter baked in, so XLA fuses the LoRA
    matmuls into the projection epilogue.
  - Decoding uses a static-shape KV cache (B, S_max, Hkv, D) updated with
    `dynamic_update_slice` inside `lax.scan` — no DynamicCache, no shape
    polymorphism.

LoRA math (parity with `Llama_LoRA.py:246-262`):
    q = Wq x + scaling * up_Q[mod](down_Q[mod](x)) [+ scaling * up_Qs(down_Qs(x))]
    v = Wv x + scaling * up_V[mod](down_V[mod](x)) [+ ...]
where scaling = ALPHA / RANK, bottleneck = round(hidden/RANK), and the V-up
output dim is kv_dim-aware (hidden // v_out_divisor).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LLMConfig, LoRAConfig, MODALITIES
from ..ops.attention import NEG_INF, causal_mask, combine_masks, dot_product_attention
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_cos_sin
from .common import (
    Params,
    init_kaiming_linear,
    init_linear,
    init_rms_norm,
    init_zeros_linear,
    linear,
    stack_layers,
)

IGNORE_INDEX = -100


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_lora_pair(rng: jax.Array, cfg: LLMConfig, dtype) -> Params:
    """One LoRA adapter set: down_Q/up_Q/down_V/up_V.

    down: zeros, up: kaiming_uniform(a=sqrt(5)) (`Llama_LoRA.py:189-192`).
    """
    lora = cfg.lora
    assert lora is not None
    h = cfg.hidden_size
    r = lora.bottleneck(h)
    v_out = h // lora.v_out_divisor
    kq, kv = jax.random.split(rng)
    return {
        "down_q": init_zeros_linear(h, r, dtype),
        "up_q": init_kaiming_linear(kq, r, h, dtype),
        "down_v": init_zeros_linear(h, r, dtype),
        "up_v": init_kaiming_linear(kv, r, v_out, dtype),
    }


def _init_layer(rng: jax.Array, cfg: LLMConfig, dtype) -> Params:
    keys = jax.random.split(rng, 12)
    h = cfg.hidden_size
    bias = cfg.attention_bias
    p: Params = {
        "input_norm": init_rms_norm(h, dtype),
        "post_attn_norm": init_rms_norm(h, dtype),
        "attn": {
            "q": init_linear(keys[0], h, cfg.q_dim, bias=bias, dtype=dtype),
            "k": init_linear(keys[1], h, cfg.kv_dim, bias=bias, dtype=dtype),
            "v": init_linear(keys[2], h, cfg.kv_dim, bias=bias, dtype=dtype),
            "o": init_linear(keys[3], cfg.q_dim, h, bias=False, dtype=dtype),
        },
        "mlp": {
            "gate": init_linear(keys[4], h, cfg.intermediate_size, bias=False, dtype=dtype),
            "up": init_linear(keys[5], h, cfg.intermediate_size, bias=False, dtype=dtype),
            "down": init_linear(keys[6], cfg.intermediate_size, h, bias=False, dtype=dtype),
        },
    }
    if cfg.moe_experts > 0:
        # BASE-capability MoE FFN replaces the dense SwiGLU MLP
        # (`models/moe.py`; the reference vendors fairseq BASE layers but
        # never activates them — here it is a first-class decoder option)
        from .moe import init_moe

        del p["mlp"]
        p["moe"] = init_moe(
            keys[11], cfg.moe_experts, h, cfg.intermediate_size, dtype)
    if cfg.lora is not None:
        if cfg.lora.task_specific:
            p["lora"] = {
                m: _init_lora_pair(keys[7 + i], cfg, dtype)
                for i, m in enumerate(MODALITIES)
            }
            if cfg.lora.shared:
                p["lora_shared"] = _init_lora_pair(keys[10], cfg, dtype)
        else:
            p["lora"] = _init_lora_pair(keys[7], cfg, dtype)
    return p


def init_llm(rng: jax.Array, cfg: LLMConfig, dtype=jnp.float32) -> Params:
    """Random-init params (real runs load converted HF weights instead)."""
    k_embed, k_layers, k_head = jax.random.split(rng, 3)
    layer_keys = jax.random.split(k_layers, cfg.num_layers)
    layers = stack_layers(tuple(_init_layer(k, cfg, dtype) for k in layer_keys))
    params: Params = {
        "embed": {
            "w": jax.random.normal(k_embed, (cfg.vocab_size, cfg.hidden_size), dtype) * 0.02
        },
        "layers": layers,
        "final_norm": init_rms_norm(cfg.hidden_size, dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {
            "w": jax.random.normal(k_head, (cfg.hidden_size, cfg.vocab_size), dtype) * 0.02
        }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _lora_delta(x: jax.Array, adapter: Params, scaling: float) -> Tuple[jax.Array, jax.Array]:
    dq = linear(linear(x, adapter["down_q"]), adapter["up_q"])
    dv = linear(linear(x, adapter["down_v"]), adapter["up_v"])
    return dq * scaling, dv * scaling


# Sentinel modality for the fused 3-task training forward: x rows are the
# three tasks' batches stacked [audio | video | audiovisual], each of size
# x.shape[0] // 3, and every block gets its own task adapter (omni.py
# train_losses with cfg.fused_task_forward).
FUSED3 = "__fused3__"


def _qkv_with_lora(
    layer: Params, cfg: LLMConfig, x: jax.Array, modality: Optional[str]
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Base q/k/v projections + the Omni-LoRA q/v deltas — the single source
    of the adapter math, shared by the training/prefill path and the
    split-cache beam decode step.

    With modality == FUSED3 the base projections run once over the stacked
    (3B, T, H) batch (one MXU matmul instead of three) and only the tiny
    LoRA deltas are computed per task block."""
    from ..config import MODALITIES

    attn = layer["attn"]
    if "qkv" in attn:  # decode trees fuse q|k|v (ops/quant.py): one stream
        qkv = linear(x, attn["qkv"])
        kv_dim = cfg.num_kv_heads * cfg.head_dim
        q = qkv[..., : cfg.q_dim]
        k = qkv[..., cfg.q_dim : cfg.q_dim + kv_dim]
        v = qkv[..., cfg.q_dim + kv_dim :]
    else:
        q = linear(x, attn["q"])
        k = linear(x, attn["k"])
        v = linear(x, attn["v"])
    if cfg.lora is not None:
        scaling = cfg.lora.scaling
        if cfg.lora.task_specific:
            assert modality is not None, "task-specific LoRA needs a modality"
            if modality == FUSED3:
                B = x.shape[0] // 3
                dqs, dvs = [], []
                for i, m in enumerate(MODALITIES):
                    xm = jax.lax.slice_in_dim(x, i * B, (i + 1) * B, axis=0)
                    dqm, dvm = _lora_delta(xm, layer["lora"][m], scaling)
                    dqs.append(dqm)
                    dvs.append(dvm)
                dq = jnp.concatenate(dqs, axis=0)
                dv = jnp.concatenate(dvs, axis=0)
            else:
                dq, dv = _lora_delta(x, layer["lora"][modality], scaling)
            if cfg.lora.shared:
                dqs_, dvs_ = _lora_delta(x, layer["lora_shared"], scaling)
                dq, dv = dq + dqs_, dv + dvs_
        else:
            dq, dv = _lora_delta(x, layer["lora"], scaling)
        q = q + dq
        # v_out may be smaller than kv_dim only through the divisor; for all
        # published configs hidden//v_out_divisor == kv_dim.
        v = v + dv
    return q, k, v


def _attention_block(
    layer: Params,
    cfg: LLMConfig,
    x: jax.Array,  # (B, T, H)
    cos: jax.Array,
    sin: jax.Array,
    mask: Optional[jax.Array],
    modality: Optional[str],
    cache: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_index: Optional[jax.Array] = None,
    flash_causal: bool = False,
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    B, T, _ = x.shape
    attn = layer["attn"]
    q, k, v = _qkv_with_lora(layer, cfg, x, modality)

    q = q.reshape(B, T, cfg.num_heads, cfg.head_dim)
    k = k.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    q, k = apply_rope(q, k, cos, sin)

    new_cache = None
    if cache is not None:
        ck, cv = cache
        assert cache_index is not None
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
        k, v = ck.astype(q.dtype), cv.astype(q.dtype)
        new_cache = (ck, cv)

    if flash_causal and cache is None:
        from ..ops.flash_attention_bwd import flash_attention_trainable

        out = flash_attention_trainable(q, k, v, causal=True)
    else:
        out = dot_product_attention(q, k, v, mask=mask)
    out = out.reshape(B, T, cfg.q_dim)
    return linear(out, attn["o"]), new_cache


def _mlp_block(layer: Params, x: jax.Array, cfg: Optional[LLMConfig] = None) -> jax.Array:
    if "moe" in layer:  # MoE FFN (cfg.moe_experts > 0, models/moe.py)
        from .moe import moe_ffn

        y, _ = moe_ffn(
            layer["moe"], x,
            capacity_factor=cfg.moe_capacity_factor if cfg else 1.25,
            routing=cfg.moe_routing if cfg else "balanced",
        )
        return y
    mlp = layer["mlp"]
    if "gateup" in mlp:  # decode trees fuse gate|up (ops/quant.py)
        gu = linear(x, mlp["gateup"])
        g, u = jnp.split(gu, 2, axis=-1)
        return linear(jax.nn.silu(g) * u, mlp["down"])
    return linear(jax.nn.silu(linear(x, mlp["gate"])) * linear(x, mlp["up"]), mlp["down"])


def _decoder_layer(
    layer: Params,
    cfg: LLMConfig,
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    mask: Optional[jax.Array],
    modality: Optional[str],
    cache: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_index: Optional[jax.Array] = None,
    flash_causal: bool = False,
):
    h = rms_norm(x, layer["input_norm"]["scale"], cfg.rms_norm_eps)
    attn_out, new_cache = _attention_block(
        layer, cfg, h, cos, sin, mask, modality, cache, cache_index, flash_causal
    )
    x = x + attn_out
    h = rms_norm(x, layer["post_attn_norm"]["scale"], cfg.rms_norm_eps)
    x = x + _mlp_block(layer, h, cfg)
    return x, new_cache


def embed_tokens(params: Params, ids: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return params["embed"]["w"].astype(dtype)[ids]


def lm_head(params: Params, cfg: LLMConfig, x: jax.Array) -> jax.Array:
    """Final-norm + unembedding. Returns f32 logits (B, T, V).

    An explicit "lm_head" entry wins over tied embeddings — the decode-time
    quantizer (ops/quant.py) installs an int8 unembedding copy for tied
    models while the bf16 embed table keeps serving token lookups."""
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps)
    if "lm_head" in params:
        head = params["lm_head"]
        if "w4" in head:  # packed-int4 unembedding (ops/quant.py::pack_int4)
            from ..ops.quant import quantized_matmul4

            B, T, H = x.shape
            logits = quantized_matmul4(
                x.reshape(B * T, H), head,
                block_m=min(128, ((B * T + 7) // 8) * 8),
                out_dtype=jnp.float32)
            return logits.reshape(B, T, -1)
        w, scale = head["w"], head.get("s")
    else:
        w, scale = params["embed"]["w"].T, None
    logits = jnp.einsum("bth,hv->btv", x, w.astype(x.dtype),
                        preferred_element_type=jnp.float32)
    if scale is not None:  # int8 per-channel unembedding (ops/quant.py)
        logits = logits * scale[None, None, :].astype(jnp.float32)
    return logits


def llm_backbone(
    params: Params,
    cfg: LLMConfig,
    inputs_embeds: jax.Array,  # (B, T, H)
    positions: jax.Array,  # (B, T) int32
    mask: Optional[jax.Array],  # bool (B,1,T,S) or None => causal
    modality: Optional[str] = None,
    remat: bool = True,
    pipeline: Optional[Any] = None,  # parallel.pipeline.PipelinePlan
) -> jax.Array:
    """Run the decoder stack, return final hidden states (pre final-norm).

    With a `PipelinePlan`, the stack runs the GPipe schedule of
    `parallel/pipeline.py` over the plan's pp mesh axis instead of the
    local `lax.scan` — same layer math (pinned by tests/test_pipeline.py),
    microbatched fill/drain over ICI. Training (causal) path only."""
    from ..ops.attention import FLASH_MIN_T_TRAIN, on_tpu

    if pipeline is not None:
        if mask is not None:
            raise ValueError("pipelined backbone supports the pure-causal "
                             "training path only (mask must be None)")
        from ..parallel.pipeline import pipeline_backbone

        return pipeline_backbone(
            pipeline.mesh, params["layers"], cfg, inputs_embeds, positions,
            modality=modality, num_microbatches=pipeline.num_microbatches,
            remat=remat, axis=pipeline.axis, dp_axis=pipeline.dp_axis)

    B, T, _ = inputs_embeds.shape
    cos, sin = rope_cos_sin(cfg, positions)
    flash_causal = (
        mask is None and on_tpu() and cfg.head_dim in (64, 128)
        and T >= FLASH_MIN_T_TRAIN
    )
    if mask is None and not flash_causal:
        mask = jnp.broadcast_to(causal_mask(T, T), (B, 1, T, T))

    sp_spec = _sequence_parallel_spec()

    def body(x, layer):
        if sp_spec is not None:
            # Sequence parallelism (GSPMD formulation): pin the residual
            # stream's T axis to the tp mesh axis between layers, so the
            # norm/elementwise work shards over tp instead of replicating.
            # XLA inserts the all-gather into attention and the
            # reduce-scatter out of the o/down matmuls. Opt-in (OMNI_SP=1)
            # and only meaningful under a (dp, tp) mesh context.
            x = jax.lax.with_sharding_constraint(x, sp_spec)
        y, _ = _decoder_layer(layer, cfg, x, cos, sin, mask, modality,
                              flash_causal=flash_causal)
        return y, None

    if remat:
        body = maybe_remat(body)
    x, _ = jax.lax.scan(body, inputs_embeds, params["layers"])
    return x


def _sequence_parallel_spec():
    """P(dp, tp) residual-stream spec when OMNI_SP=1, else None. The
    reference has no SP (SURVEY §5); this is the TPU-native option for
    long-prefix training under a tensor-parallel mesh."""
    import os

    if os.environ.get("OMNI_SP", "0") != "1":
        return None
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import AXIS_DP, AXIS_TP

    return P(AXIS_DP, AXIS_TP, None)


def maybe_remat(body):
    """Per-layer rematerialisation wrap, mode via OMNI_REMAT:

      dots (default) — save MXU outputs (matmul results), recompute only the
        cheap elementwise/softmax work in the backward.
      off  — no checkpoint at all: the scan saves every intermediate. At
        AVSR sequence lengths the activations are small (a few GB even at
        batch 12), and skipping the elementwise recompute measurably speeds
        the backward (benchmarks/bwd_breakdown.py).
      full — classic everything-recomputed remat (lowest memory) for
        long-sequence or memory-tight runs."""
    import os

    mode = os.environ.get("OMNI_REMAT", "dots")
    if mode == "off":
        return body
    policy = (None if mode == "full"
              else jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims)
    return jax.checkpoint(body, prevent_cse=False, policy=policy)


def llm_logits(
    params: Params,
    cfg: LLMConfig,
    inputs_embeds: jax.Array,
    positions: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    modality: Optional[str] = None,
    remat: bool = True,
) -> jax.Array:
    B, T, _ = inputs_embeds.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    x = llm_backbone(params, cfg, inputs_embeds, positions, mask, modality, remat)
    return lm_head(params, cfg, x)


def token_ce_stats(
    logits: jax.Array, targets: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-ROW (sum of -logp, valid-token count) where logits (B, N, V) align
    1:1 with targets (B, N) — the shift has already been applied by the
    caller. Targets == IGNORE_INDEX contribute exactly zero."""
    logits = logits.astype(jnp.float32)
    valid = targets != IGNORE_INDEX
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    token_lp = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(valid, -token_lp, 0.0), axis=1)
    count = jnp.sum(valid, axis=1)
    return total, count


def causal_lm_token_stats(
    logits: jax.Array, labels: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-ROW (sum of -logp, valid-token count) for the HF CausalLM loss —
    lets callers form per-task means from a fused multi-task batch."""
    return token_ce_stats(logits[:, :-1], labels[:, 1:])


def llm_span_stats(
    params: Params,
    cfg: LLMConfig,
    inputs_embeds: jax.Array,  # (B, T, H)
    labels: jax.Array,  # (B, T)
    span: Tuple[int, int],  # static [t0, t1): label-active logits positions
    modality: Optional[str] = None,
    remat: bool = True,
    pipeline: Optional[Any] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Shifted-CE stats computed ONLY on the label-active span.

    In the Omni sequence layout the multimodal prefix carries IGNORE_INDEX
    labels (`modeling_OmniAVSR.py:373-387`), so ~85% of lm_head rows (and
    their f32 softmax + backward dgrad against the 128k-vocab unembedding)
    are provably-zero work. The backbone still runs the full sequence; only
    positions [t0, t1) enter final-norm + lm_head + CE. Exact: CE over
    IGNORE positions contributes 0 and lm_head is row-independent."""
    B, T, _ = inputs_embeds.shape
    t0, t1 = span
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    x = llm_backbone(params, cfg, inputs_embeds, positions, None, modality,
                     remat, pipeline=pipeline)
    logits = lm_head(params, cfg, x[:, t0:t1])
    return token_ce_stats(logits, labels[:, t0 + 1 : t1 + 1])


def causal_lm_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """HF CausalLM loss: shift by one, mean CE over labels != -100, in f32."""
    total, count = causal_lm_token_stats(logits, labels)
    return jnp.sum(total) / jnp.maximum(jnp.sum(count), 1)


def llm_loss(
    params: Params,
    cfg: LLMConfig,
    inputs_embeds: jax.Array,
    labels: jax.Array,
    modality: Optional[str] = None,
    remat: bool = True,
) -> jax.Array:
    """Training loss with pure causal masking (the reference passes no
    attention_mask with inputs_embeds — right-padding + -100 labels make the
    causal mask exactly correct; see `modeling_OmniAVSR.py:263-306`)."""
    logits = llm_logits(params, cfg, inputs_embeds, modality=modality, remat=remat)
    return causal_lm_loss(logits, labels)


# ---------------------------------------------------------------------------
# KV-cache decoding
#
# Two layouts:
#   KVCache          — one contiguous buffer (prefix + generated slots).
#   Split beam cache — the prefix K/V is stored ONCE per batch item
#     (L, B, P, Hkv, D) and shared by all beams; only the generated-token
#     cache (L, B*K, max_new, Hkv, D) is per-beam. Beam reordering then
#     gathers ~P/max_new x less memory, and attention merges the two
#     segments with an exact online-softmax (flash-style) combination.
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """Static-shape KV cache, stacked over layers: (L, B, S_max, Hkv, D)."""

    k: jax.Array
    v: jax.Array

    @classmethod
    def create(cls, cfg: LLMConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def llm_prefill(
    params: Params,
    cfg: LLMConfig,
    inputs_embeds: jax.Array,  # (B, P, H) padded prefix
    prefix_len: jax.Array,  # (B,) actual lengths (<= P)
    cache: KVCache,
    modality: Optional[str] = None,
) -> Tuple[jax.Array, KVCache]:
    """Contiguous-prefix prefill: valid tokens occupy slots [0, prefix_len).
    Returns logits at the last valid position, (B, V)."""
    B, P, _ = inputs_embeds.shape
    key_valid = jnp.arange(P)[None] < prefix_len[:, None]
    positions = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None], (B, P))
    last_idx = jnp.clip(prefix_len - 1, 0, P - 1)
    return llm_prefill_masked(
        params, cfg, inputs_embeds, key_valid, positions, last_idx, cache, modality
    )


def llm_prefill_masked(
    params: Params,
    cfg: LLMConfig,
    inputs_embeds: jax.Array,  # (B, P, H)
    key_valid: jax.Array,  # (B, P) bool — which prefix slots are real tokens
    positions: jax.Array,  # (B, P) int32 — rope positions (gaps collapsed)
    last_idx: jax.Array,  # (B,) slot holding the final prefix token
    cache: KVCache,
    modality: Optional[str] = None,
) -> Tuple[jax.Array, KVCache]:
    """Gap-tolerant prefill: the prefix may have invalid slots anywhere
    (e.g. per-sample audio/video token counts inside a static layout).
    Masked slots never act as keys; positions are caller-collapsed cumsums,
    so the model sees exactly the compacted sequence.
    """
    B, P, _ = inputs_embeds.shape
    cos, sin = rope_cos_sin(cfg, positions)
    S = cache.max_len
    kv = jnp.pad(key_valid, ((0, 0), (0, S - P)))  # generated slots invalid at prefill
    qmask = combine_masks(
        causal_mask(P, S),  # slot order == logical order, so causal-by-slot is exact
        kv[:, None, None, :],
    )

    def body(x, layer_and_cache):
        layer, ck, cv = layer_and_cache
        y, new_cache = _decoder_layer(
            layer, cfg, x, cos, sin, qmask, modality,
            cache=(ck, cv), cache_index=jnp.int32(0),
        )
        return y, new_cache

    x, (new_k, new_v) = jax.lax.scan(
        body, inputs_embeds, (params["layers"], cache.k, cache.v)
    )
    # unembed ONLY the last valid position — a full (B, P, V) logits tensor
    # would be ~P x larger for no reason on the decode hot path
    x_last = jnp.take_along_axis(x, last_idx[:, None, None], axis=1)  # (B,1,H)
    last_logits = lm_head(params, cfg, x_last)[:, 0]
    return last_logits, KVCache(new_k, new_v)


class SplitCache(NamedTuple):
    """Beam-decode cache: shared prefix + per-beam generated tokens.

    Layouts are chosen for the decode loop's memory traffic, not for
    prefill convenience (the one-time transpose at `from_prefill` is noise):
      - prefix (L, B, Hkv, P, D): per-(batch, head) keys are a contiguous
        (P, D) block — the unit both XLA's batched attention matmul and a
        per-head kernel DMA want.
      - gen (B*K, L, Hkv, N, D): BEAM-LEADING, so the per-step parent
        reorder is a leading-axis row gather over contiguous
        L*Hkv*N*D-element rows. The same permutation on a (L, BK, ...)
        layout gathers 16x smaller strided slices and measured 4.5x slower
        on-chip (142 vs 634 GB/s, benchmarks/llm_step_breakdown.py).
    """

    prefix_k: jax.Array  # (L, B, Hkv, P, D)
    prefix_v: jax.Array
    gen_k: jax.Array  # (B*K, L, Hkv, N, D)
    gen_v: jax.Array

    @classmethod
    def from_prefill(cls, cache: "KVCache", prefix_pad: int, num_beams: int,
                     max_new: int) -> "SplitCache":
        L, B, S, H, D = cache.k.shape
        zeros = jnp.zeros((B * num_beams, L, H, max_new, D), cache.k.dtype)
        pk = cache.k[:, :, :prefix_pad].transpose(0, 1, 3, 2, 4)
        pv = cache.v[:, :, :prefix_pad].transpose(0, 1, 3, 2, 4)
        return cls(pk, pv, zeros, jnp.zeros_like(zeros))

    def reorder(self, flat_idx: jax.Array) -> "SplitCache":
        """Permute only the generated region by beam parent index.

        The gather runs on a flattened (BK, L*Hkv*N*D) view: XLA lowers a
        2D leading-axis row gather to a near-memcpy copy (measured 634 GB/s)
        while the semantically identical 5D gather lowers ~2.5x slower —
        the reshape itself is free (row-major contiguous)."""
        def rows(x):
            return x.reshape(x.shape[0], -1)[flat_idx].reshape(x.shape)

        return SplitCache(self.prefix_k, self.prefix_v,
                          rows(self.gen_k), rows(self.gen_v))

    def append(self, k: jax.Array, v: jax.Array, step: jax.Array) -> "SplitCache":
        """Write one generated token's K/V for ALL layers at once.

        k/v: (L, B*K, Hkv, D) stacked per-layer projections (a scan output).
        One dynamic_update_slice outside the layer scan replaces the
        per-layer in-scan cache updates — the current token instead enters
        attention as an explicit third block (`_merged_beam_attention`)."""
        kw = k.transpose(1, 0, 2, 3)[:, :, :, None]  # (BK, L, Hkv, 1, D)
        vw = v.transpose(1, 0, 2, 3)[:, :, :, None]
        gk = jax.lax.dynamic_update_slice(
            self.gen_k, kw.astype(self.gen_k.dtype), (0, 0, 0, step, 0))
        gv = jax.lax.dynamic_update_slice(
            self.gen_v, vw.astype(self.gen_v.dtype), (0, 0, 0, step, 0))
        return SplitCache(self.prefix_k, self.prefix_v, gk, gv)


class AncSplitCache(NamedTuple):
    """Beam-decode cache for the fused-kernel route: NO physical reorder.

    Generated K/V stay at the row that wrote them; the beam_search loop
    maintains an ancestor table anc[b, k, n] = cache row holding beam k's
    token for slot n, and `ops/beam_attention.py` masks the cross logits
    with it. This removes the ~1 GB/step reorder gather the HF-style
    `SplitCache.reorder` pays at serving shapes. Layouts give the kernel
    one contiguous block per batch item: gen (L, B, Hkv, K, N, D), prefix
    (L, B, Hkv, P, D)."""

    prefix_k: jax.Array  # (L, B, Hkv, P, D)
    prefix_v: jax.Array
    gen_k: jax.Array  # (L, B, Hkv, K, N, D)
    gen_v: jax.Array

    @classmethod
    def from_prefill(cls, cache: "KVCache", prefix_pad: int, num_beams: int,
                     max_new: int) -> "AncSplitCache":
        L, B, S, H, D = cache.k.shape
        zeros = jnp.zeros((L, B, H, num_beams, max_new, D), cache.k.dtype)
        pk = cache.k[:, :, :prefix_pad].transpose(0, 1, 3, 2, 4)
        pv = cache.v[:, :, :prefix_pad].transpose(0, 1, 3, 2, 4)
        return cls(pk, pv, zeros, jnp.zeros_like(zeros))

    def append(self, k: jax.Array, v: jax.Array, step: jax.Array,
               num_beams: int) -> "AncSplitCache":
        """k/v: (L, B*K, Hkv, D) stacked per-layer projections."""
        L, BK, Hkv, D = k.shape
        K = num_beams
        kw = k.reshape(L, BK // K, K, Hkv, D).transpose(0, 1, 3, 2, 4)
        vw = v.reshape(L, BK // K, K, Hkv, D).transpose(0, 1, 3, 2, 4)
        gk = jax.lax.dynamic_update_slice(
            self.gen_k, kw[:, :, :, :, None].astype(self.gen_k.dtype),
            (0, 0, 0, 0, step, 0))
        gv = jax.lax.dynamic_update_slice(
            self.gen_v, vw[:, :, :, :, None].astype(self.gen_v.dtype),
            (0, 0, 0, 0, step, 0))
        return AncSplitCache(self.prefix_k, self.prefix_v, gk, gv)


def update_ancestors(anc: jax.Array, flat_idx: jax.Array,
                     step: jax.Array, num_beams: int) -> jax.Array:
    """Advance the (B, K, N) ancestor table by one selection round: beam
    slot k inherits its parent's chain for slots < step and owns row k at
    slot == step (where this step's K/V will be written)."""
    B, K, N = anc.shape
    parent = flat_idx.reshape(B, K) - (jnp.arange(B) * K)[:, None]
    anc = jnp.take_along_axis(anc, parent[:, :, None], axis=1)
    rows = jnp.broadcast_to(jnp.arange(K, dtype=anc.dtype)[None, :, None],
                            (B, K, 1))
    return jax.lax.dynamic_update_slice(anc, rows, (0, 0, step))


def _merged_beam_attention(
    cfg: LLMConfig,
    q: jax.Array,  # (B*K, 1, Hq, D)
    pk: jax.Array,  # (B, Hkv, P, D) shared prefix keys
    pv: jax.Array,
    gk: jax.Array,  # (B*K, Hkv, N, D) per-beam generated keys
    gv: jax.Array,
    k_cur: jax.Array,  # (B*K, Hkv, D) — this step's key (not yet in cache)
    v_cur: jax.Array,
    prefix_mask: jax.Array,  # (B, P) bool
    gen_mask: jax.Array,  # (N,) bool — slots < step (strictly before now)
    num_beams: int,
) -> jax.Array:
    """Exact attention over [shared prefix | per-beam generated | current
    token] without materialising the prefix per beam: three logit blocks
    merged through a joint softmax in f32. The current token rides its own
    rank-1 block so the cache write can happen ONCE per step outside the
    layer scan (`SplitCache.append`) instead of per layer inside it."""
    BK, _, Hq, D = q.shape
    B = BK // num_beams
    K = num_beams
    Hkv = pk.shape[1]
    G = Hq // Hkv
    scale = jnp.float32(D ** -0.5)

    qg = q.reshape(B, K, Hkv, G, D)
    lp = jnp.einsum("bkhgd,bhpd->bkhgp", qg, pk, preferred_element_type=jnp.float32)
    lp = lp * scale + jnp.where(prefix_mask, 0.0, NEG_INF)[:, None, None, None, :]
    qg2 = q.reshape(BK, Hkv, G, D)
    lg = jnp.einsum("khgd,khnd->khgn", qg2, gk, preferred_element_type=jnp.float32)
    lg = (lg * scale).reshape(B, K, Hkv, G, -1)
    lg = lg + jnp.where(gen_mask, 0.0, NEG_INF)[None, None, None, None, :]
    lc = jnp.einsum("khgd,khd->khg", qg2, k_cur,
                    preferred_element_type=jnp.float32)
    lc = (lc * scale).reshape(B, K, Hkv, G)[..., None]  # (B,K,Hkv,G,1)

    m = jnp.maximum(jnp.maximum(jnp.max(lp, axis=-1), jnp.max(lg, axis=-1)),
                    lc[..., 0])[..., None]
    ep, eg, ec = jnp.exp(lp - m), jnp.exp(lg - m), jnp.exp(lc - m)
    denom = (jnp.sum(ep, axis=-1) + jnp.sum(eg, axis=-1)
             + ec[..., 0])  # (B,K,Hkv,G)
    op = jnp.einsum("bkhgp,bhpd->bkhgd", ep.astype(pv.dtype), pv)
    og = jnp.einsum("khgn,khnd->khgd",
                    eg.reshape(BK, Hkv, G, -1).astype(gv.dtype), gv).reshape(B, K, Hkv, G, D)
    oc = (ec.reshape(BK, Hkv, G, 1).astype(v_cur.dtype)
          * v_cur[:, :, None, :]).reshape(B, K, Hkv, G, D)
    out = (op + og + oc) / denom[..., None].astype(pv.dtype)
    return out.reshape(BK, 1, Hq, D)


def llm_decode_step_beam(
    params: Params,
    cfg: LLMConfig,
    token_embeds: jax.Array,  # (B*K, 1, H)
    step: jax.Array,
    n_valid: jax.Array,  # (B*K,) valid prefix token counts (positions)
    prefix_mask: jax.Array,  # (B, P) bool — valid prefix slots
    cache: SplitCache,
    num_beams: int,
    modality: Optional[str] = None,
) -> Tuple[jax.Array, SplitCache]:
    """Beam decode step on the split cache (XLA attention + physical
    reorder route). Returns ((B*K, V), cache)."""
    BK = token_embeds.shape[0]
    L = cache.gen_k.shape[1]
    positions = (n_valid + step)[:, None].astype(jnp.int32)
    cos, sin = rope_cos_sin(cfg, positions)
    N = cache.gen_k.shape[3]
    gen_mask = jnp.arange(N) < step  # current token is its own block

    def body(x, layer_and_cache):
        layer, pk, pv, l = layer_and_cache
        h = rms_norm(x, layer["input_norm"]["scale"], cfg.rms_norm_eps)
        attn = layer["attn"]
        q, k, v = _qkv_with_lora(layer, cfg, h, modality)
        q = q.reshape(BK, 1, cfg.num_heads, cfg.head_dim)
        k = k.reshape(BK, 1, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(BK, 1, cfg.num_kv_heads, cfg.head_dim)
        q, k = apply_rope(q, k, cos, sin)
        k_cur = k[:, 0]  # (BK, Hkv, D)
        v_cur = v[:, 0]
        gk = jax.lax.dynamic_index_in_dim(cache.gen_k, l, axis=1, keepdims=False)
        gv = jax.lax.dynamic_index_in_dim(cache.gen_v, l, axis=1, keepdims=False)
        out = _merged_beam_attention(
            cfg, q, pk.astype(q.dtype), pv.astype(q.dtype), gk.astype(q.dtype),
            gv.astype(q.dtype), k_cur, v_cur, prefix_mask, gen_mask,
            num_beams,
        )
        x = x + linear(out.reshape(BK, 1, cfg.q_dim), attn["o"])
        h2 = rms_norm(x, layer["post_attn_norm"]["scale"], cfg.rms_norm_eps)
        x = x + _mlp_block(layer, h2, cfg)
        return x, (k_cur, v_cur)

    x, (ks, vs) = jax.lax.scan(
        body, token_embeds,
        (params["layers"], cache.prefix_k, cache.prefix_v,
         jnp.arange(L, dtype=jnp.int32)),
    )
    logits = lm_head(params, cfg, x)[:, 0]
    return logits, cache.append(ks, vs, step)


def llm_decode_step_beam_anc(
    params: Params,
    cfg: LLMConfig,
    token_embeds: jax.Array,  # (B*K, 1, H)
    step: jax.Array,
    n_valid: jax.Array,  # (B*K,) valid prefix token counts (positions)
    prefix_mask: jax.Array,  # (B, P) bool — valid prefix slots
    cache: AncSplitCache,
    anc: jax.Array,  # (B, K, N) int32 — already advanced for this step
    num_beams: int,
    modality: Optional[str] = None,
    attn_mesh=None,  # Mesh: run the kernel per-tp-shard (shard_map)
) -> Tuple[jax.Array, AncSplitCache]:
    """Beam decode step on the no-reorder ancestor cache: attention runs in
    the fused Pallas kernel (`ops/beam_attention.py`), the gen cache is
    scanned per layer (L-leading xs — legal again because it is never
    permuted), and the step's K/V land via one post-scan `append`."""
    from ..ops.beam_attention import beam_decode_attention

    BK = token_embeds.shape[0]
    positions = (n_valid + step)[:, None].astype(jnp.int32)
    cos, sin = rope_cos_sin(cfg, positions)
    prefix_bias = jnp.where(prefix_mask, 0.0, NEG_INF).astype(jnp.float32)

    def body(x, layer_and_cache):
        layer, pk, pv, gk, gv = layer_and_cache
        h = rms_norm(x, layer["input_norm"]["scale"], cfg.rms_norm_eps)
        attn = layer["attn"]
        q, k, v = _qkv_with_lora(layer, cfg, h, modality)
        q = q.reshape(BK, 1, cfg.num_heads, cfg.head_dim)
        k = k.reshape(BK, 1, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(BK, 1, cfg.num_kv_heads, cfg.head_dim)
        q, k = apply_rope(q, k, cos, sin)
        k_cur = k[:, 0]  # (BK, Hkv, D)
        v_cur = v[:, 0]
        out = beam_decode_attention(
            q, pk.astype(q.dtype), pv.astype(q.dtype), gk.astype(q.dtype),
            gv.astype(q.dtype), k_cur, v_cur, prefix_bias, anc, step,
            num_beams, mesh=attn_mesh,
        )
        x = x + linear(out.reshape(BK, 1, cfg.q_dim), attn["o"])
        h2 = rms_norm(x, layer["post_attn_norm"]["scale"], cfg.rms_norm_eps)
        x = x + _mlp_block(layer, h2, cfg)
        return x, (k_cur, v_cur)

    x, (ks, vs) = jax.lax.scan(
        body, token_embeds,
        (params["layers"], cache.prefix_k, cache.prefix_v,
         cache.gen_k, cache.gen_v),
    )
    logits = lm_head(params, cfg, x)[:, 0]
    return logits, cache.append(ks, vs, step, num_beams)


def llm_decode_step(
    params: Params,
    cfg: LLMConfig,
    token_embeds: jax.Array,  # (B, 1, H)
    step: jax.Array,  # scalar int32: index of this generated token (0-based)
    prefix_len: jax.Array,  # (B,) — number of VALID prefix tokens
    prefill_pad: int,  # static P (prefix slots in the cache)
    cache: KVCache,
    modality: Optional[str] = None,
    key_valid: Optional[jax.Array] = None,  # (B, P) for gap-tolerant prefixes
) -> Tuple[jax.Array, KVCache]:
    """One greedy/beam decode step. Writes cache slot P+step; position is
    prefix_len + step (matching HF position semantics on the unpadded
    sequence). Returns (B, V) logits."""
    B = token_embeds.shape[0]
    positions = (prefix_len + step)[:, None].astype(jnp.int32)  # (B,1)
    cos, sin = rope_cos_sin(cfg, positions)
    S = cache.max_len
    key_pos = jnp.arange(S)
    gen_valid = (key_pos[None] >= prefill_pad) & (key_pos[None] <= prefill_pad + step)
    if key_valid is not None:
        pv = jnp.pad(key_valid, ((0, 0), (0, S - prefill_pad)))
        kv_mask = pv | gen_valid
    else:
        kv_mask = (key_pos[None] < prefix_len[:, None]) | gen_valid
    mask = kv_mask[:, None, None, :]  # (B,1,1,S)
    cache_index = prefill_pad + step

    def body(x, layer_and_cache):
        layer, ck, cv = layer_and_cache
        y, new_cache = _decoder_layer(
            layer, cfg, x, cos, sin, mask, modality,
            cache=(ck, cv), cache_index=cache_index,
        )
        return y, new_cache

    x, (new_k, new_v) = jax.lax.scan(
        body, token_embeds, (params["layers"], cache.k, cache.v)
    )
    logits = lm_head(params, cfg, x)[:, 0]
    return logits, KVCache(new_k, new_v)
