"""Pallas TPU flash attention (forward).

Online-softmax blocked attention: the (T x S) logits matrix never touches
HBM — each (BQ x BK) tile lives in VMEM, with running max/denominator/
accumulator scratch carried across the key-block grid dimension. This is
the kernel replacement for the reference's SDPA / bmm+softmax attention
(`Llama_LoRA.py:300-307`, fairseq `multihead_attention.py`) on paths that
don't need a backward pass (frozen Whisper tower, decode prefill); training
paths keep the XLA attention (ops/attention.py) whose backward XLA already
fuses well.

Supports: bidirectional or causal, per-batch key-length masking (scalar
prefetch), GQA (q heads grouped onto kv heads via index maps), head dims
64/128, bf16 inputs with f32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _keep_mask(seed, h, q_start, k_start, block_q, block_k, seq_k, rate):
    """Tiling-independent attention-probs dropout mask.

    A murmur-style integer hash of the absolute (query, key) position (plus
    the flattened batch*head index and a per-call seed) decides each element,
    so the forward and the two backward kernels reproduce the IDENTICAL mask
    even though they clamp block shapes differently. This replaces torch's
    `F.dropout(attn_weights)` (reference fairseq multihead_attention) without
    ever materialising the (T x S) mask in HBM.
    """
    q_idx = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_idx = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    x = q_idx * jnp.int32(seq_k) + k_idx
    x = x + h * jnp.int32(-1640531527)  # 0x9E3779B9 (golden-ratio odd const)
    x = x ^ seed
    # murmur3 finalizer: full avalanche over int32 (wrapping multiply is
    # defined two's-complement in XLA)
    x = x * jnp.int32(-2048144789)  # 0x85EBCA6B
    x = x ^ jax.lax.shift_right_logical(x, 13)
    x = x * jnp.int32(-1028477387)  # 0xC2B2AE35
    x = x ^ jax.lax.shift_right_logical(x, 16)
    # x is uniform over the full signed range; drop iff x < threshold where
    # P(x < t) == rate  =>  t = rate * 2^32 - 2^31
    thresh = int(round(rate * 2**32 - 2**31))
    thresh = max(-(2**31), min(2**31 - 1, thresh))
    return x >= jnp.int32(thresh)


def _kernel(
    # scalar prefetch: [0] dropout seed, [1:] per-batch kv lengths
    lens_ref,  # (1+B,) int32 or (1,) dummy
    # blocks
    q_ref,  # (1, BQ, D)
    k_ref,  # (1, BK, D)
    v_ref,  # (1, BK, D)
    o_ref,  # (1, BQ, D)
    lse_ref,  # (1, 1, BQ) f32 — row logsumexp (for the backward pass)
    # scratch
    m_scr,  # (BQ, 1) f32
    l_scr,  # (BQ, 1) f32
    acc_scr,  # (BQ, D) f32
    *,
    scale: float,
    causal: bool,
    use_lens: bool,
    num_heads: int,
    block_q: int,
    block_k: int,
    seq_k: int,
    dropout_rate: float = 0.0,
):
    hq = pl.program_id(0)  # read outside pl.when: interpret mode can't
    iq = pl.program_id(1)  # lower program_id inside a traced cond
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = iq * block_q
    k_start = ik * block_k
    if use_lens:
        kv_len = lens_ref[1 + hq // num_heads]

    # causal: whole block strictly above the diagonal -> skip
    run = True
    if causal:
        run = k_start <= q_start + block_q - 1

    @pl.when(run if causal else True)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, BK)

        kv_idx = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = kv_idx < seq_k
        if use_lens:
            mask &= kv_idx < kv_len
        if causal:
            q_idx = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask &= kv_idx <= q_idx
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        # l accumulates the TRUE softmax denominator (pre-dropout); dropout
        # only zeroes rows of the p @ v accumulation, matching
        # out = dropout(softmax(s)) @ v exactly.
        l_scr[:] = l_scr[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        if dropout_rate > 0.0:
            keep = _keep_mask(lens_ref[0], hq, q_start, k_start,
                              block_q, block_k, seq_k, dropout_rate)
            p_v = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_rate))
        else:
            p_v = p
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            p_v.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = m_new

    @pl.when(ik == nk - 1)
    def _finalize():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_scr[:] + jnp.log(l))[:, 0]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_attention(
    q: jax.Array,  # (B, T, Hq, D)
    k: jax.Array,  # (B, S, Hkv, D)
    v: jax.Array,
    mask: Optional[jax.Array] = None,  # unsupported in-kernel; use causal/lengths
    scale: Optional[float] = None,
    causal: bool = False,
    kv_lengths: Optional[jax.Array] = None,  # (B,)
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
    return_lse: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,  # int32 scalar
) -> jax.Array:
    """Flash attention forward. For arbitrary dense masks fall back to
    ops.attention.dot_product_attention.

    Default tiles measured on v5e at encoder shapes (B4 T1536 H16 D64):
    bq512/bk1024+ beats XLA's fused attention by ~1.4-1.6x; small 128x128
    tiles LOSE to XLA (0.75x) — tile size is the whole game here."""
    assert mask is None, "pallas kernel supports causal/length masks only"
    assert dropout_rate == 0.0 or dropout_seed is not None, (
        "dropout_rate > 0 requires an int32 dropout_seed")
    B, T, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5

    # clamp tiles to the (padded) sequence so short inputs don't over-pad;
    # a single k-block (the v5e sweep's best config) when the row fits VMEM
    block_q = min(block_q, _round_up(T, 128))
    s128 = _round_up(S, 128)
    block_k = s128 if s128 <= 1536 else min(block_k, s128)

    # pad sequence dims to block multiples
    Tp, Sp = _round_up(T, block_q), _round_up(S, block_k)
    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
    if Sp != S:
        k = jnp.pad(k, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))

    # (B, T, H, D) -> (B*H, T, D)
    qf = q.transpose(0, 2, 1, 3).reshape(B * Hq, Tp, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * Hkv, Sp, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * Hkv, Sp, D)

    seed = (jnp.asarray(dropout_seed, jnp.int32).reshape(1)
            if dropout_seed is not None else jnp.zeros((1,), jnp.int32))
    lens = (kv_lengths.astype(jnp.int32) if kv_lengths is not None
            else jnp.zeros((0,), jnp.int32))
    scalars = jnp.concatenate([seed, lens])

    grid = (B * Hq, Tp // block_q, Sp // block_k)
    kern = functools.partial(
        _kernel,
        scale=float(scale), causal=causal,
        use_lens=kv_lengths is not None,
        num_heads=Hq, block_q=block_q, block_k=block_k, seq_k=S,
        dropout_rate=float(dropout_rate),
    )
    out, lse = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # NB: with scalar prefetch, index maps receive the prefetch
                # ref as a trailing argument
                pl.BlockSpec((1, block_q, D), lambda h, iq, ik, lens: (h, iq, 0)),
                # GQA: q head h uses kv head h // G of batch h // Hq
                pl.BlockSpec(
                    (1, block_k, D),
                    lambda h, iq, ik, lens, _G=G, _Hq=Hq, _Hkv=Hkv:
                        ((h // _Hq) * _Hkv + (h % _Hq) // _G, ik, 0),
                ),
                pl.BlockSpec(
                    (1, block_k, D),
                    lambda h, iq, ik, lens, _G=G, _Hq=Hq, _Hkv=Hkv:
                        ((h // _Hq) * _Hkv + (h % _Hq) // _G, ik, 0),
                ),
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, D), lambda h, iq, ik, lens: (h, iq, 0)),
                pl.BlockSpec((1, 1, block_q), lambda h, iq, ik, lens: (h, 0, iq)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * Hq, Tp, D), q.dtype),
            jax.ShapeDtypeStruct((B * Hq, 1, Tp), jnp.float32),
        ),
        interpret=interpret,
    )(scalars, qf, kf, vf)

    out = out.reshape(B, Hq, Tp, D).transpose(0, 2, 1, 3)[:, :T]
    if return_lse:
        return out, lse[:, 0, :T]
    return out
