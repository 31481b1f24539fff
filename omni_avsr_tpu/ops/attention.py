"""Attention ops: GQA/MHA dot-product attention with f32 softmax.

This is the XLA path — batched einsums that map straight onto the MXU with
logits accumulated in f32. A Pallas flash-attention kernel
(`ops/flash_attention.py`) plugs in behind the same interface for long
sequences; for the sequence lengths on the Omni-AVSR hot path (<= ~1600)
XLA's fused attention is already near roofline, so the XLA path is the
default and the kernel is opt-in via `impl="pallas"`.

Replaces on the reference side:
  - torch SDPA in Llama/Qwen LoRA attention (`Omni_AVSR/Llama_LoRA.py:300-307`)
  - fairseq bmm+softmax MultiheadAttention
    (`av_hubert/fairseq/fairseq/modules/multihead_attention.py:114-385`)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# Minimum sequence length at which the trainable flash kernel replaces XLA
# attention in the encoder/LLM training paths. Tuned on the real v5e chip
# (full flagship train step, benchmarks/train_step.py): at frames=320
# (T_enc=320, T_llm~300) the kernel + in-kernel dropout beats XLA-with-
# dropout 212.4 vs 220.1 ms/step; at frames=128 XLA wins slightly (132.9 vs
# 135.2 ms), so the gate stays at 256. Overridable for experiments
# (benchmarks/attention_sweep.py sweeps it).
FLASH_MIN_T_TRAIN = int(os.environ.get("OMNI_FLASH_MIN_T", "256"))


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def dot_product_attention(
    q: jax.Array,  # (B, T, Hq, D)
    k: jax.Array,  # (B, S, Hkv, D)
    v: jax.Array,  # (B, S, Hkv, D)
    mask: Optional[jax.Array] = None,  # bool (B, 1|Hq, T, S); True = attend
    scale: Optional[float] = None,
    impl: str = "xla",
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
) -> jax.Array:
    """Grouped-query attention. Returns (B, T, Hq, D).

    The GQA group dim is folded into the einsum (no materialised repeat_kv,
    unlike the reference's `repeat_kv` at `Llama_LoRA.py:293-294`) so the MXU
    sees one big contraction per head group and HBM never holds expanded K/V.
    """
    if impl == "pallas":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask, scale=scale)

    B, T, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5

    qg = q.reshape(B, T, Hkv, G, D)
    # logits: (B, Hkv, G, T, S) in f32 straight off the MXU
    logits = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.float32(scale)

    if mask is not None:
        if mask.dtype == jnp.bool_:
            mh = mask.shape[1]
            if mh == 1:
                m = mask[:, :, None]  # (B,1,1,T,S)
            else:
                m = mask.reshape(B, Hkv, G, T, -1)
            logits = jnp.where(m, logits, NEG_INF)
        else:
            mh = mask.shape[1]
            madd = mask.astype(jnp.float32)
            if mh == 1:
                logits = logits + madd[:, :, None]
            else:
                logits = logits + madd.reshape(B, Hkv, G, T, -1)

    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep.astype(probs.dtype) / (1.0 - dropout_rate)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, v)
    return out.reshape(B, T, Hq, D)


def causal_mask(T: int, S: int, offset: int = 0) -> jax.Array:
    """(1, 1, T, S) boolean causal mask. Query position i (global i+offset)
    may attend to key positions <= i+offset."""
    qi = jnp.arange(T)[:, None] + offset
    kj = jnp.arange(S)[None, :]
    return (kj <= qi)[None, None]


def padding_mask_from_lengths(lengths: jax.Array, S: int) -> jax.Array:
    """(B, S) boolean; True where the key position is valid."""
    return jnp.arange(S)[None, :] < lengths[:, None]


def combine_masks(*masks: Optional[jax.Array]) -> Optional[jax.Array]:
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else jnp.logical_and(out, m)
    return out
