"""Flash attention backward (Pallas) + custom-VJP trainable wrapper.

Standard flash backward with the forward's row logsumexp as residual:
    p  = exp(q k^T * scale - lse)          (masked like the forward)
    dv = p^T do
    dp = do v^T
    ds = p * (dp - rowsum(do * o)) * scale
    dq = ds k        (kernel 1: grid over q blocks, loop k blocks)
    dk = ds^T q      (kernel 2: grid over k blocks, loop q blocks, with dv)

GQA: the kernels compute dk/dv per *query* head; the group-sum down to kv
heads happens in XLA afterwards (G <= 4 on every model here).

`flash_attention_trainable` wires these into jax.custom_vjp so training
paths (AV-HuBERT encoder with LoRA, the LLM's causal stacks) get the tuned
forward kernel AND an HBM-light backward — the (T x S) probability matrix
never materialises in either direction.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import NEG_INF, _keep_mask, _round_up, flash_attention


def _mask(q_start, k_start, block_q, block_k, seq_k, causal, kv_len):
    kv_idx = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    m = kv_idx < seq_k
    if kv_len is not None:
        m &= kv_idx < kv_len
    if causal:
        q_idx = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        m &= kv_idx <= q_idx
    return m


def _dq_kernel(
    lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, dq_ref, acc_scr,
    *, scale, causal, use_lens, num_heads, block_q, block_k, seq_k,
    dropout_rate=0.0,
):
    hq = pl.program_id(0)  # read outside pl.when (interpret-mode cond limit)
    iq, ik, nk = pl.program_id(1), pl.program_id(2), pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    kv_len = lens_ref[1 + hq // num_heads] if use_lens else None
    q_start, k_start = iq * block_q, ik * block_k

    run = (k_start <= q_start + block_q - 1) if causal else True

    @pl.when(run if causal else True)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = _mask(q_start, k_start, block_q, block_k, seq_k, causal, kv_len)
        p = jnp.where(m, jnp.exp(s - lse_ref[0, 0][:, None]), 0.0)
        dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            # dL/dp = (do v^T) * keep / (1-rate); dsum already equals
            # rowsum(p_dropped * do v^T) == rowsum(do * o), so only dp
            # needs the mask (see _keep_mask in flash_attention.py).
            keep = _keep_mask(lens_ref[0], hq, q_start, k_start,
                              block_q, block_k, seq_k, dropout_rate)
            dp = jnp.where(keep, dp, 0.0) * (1.0 / (1.0 - dropout_rate))
        ds = p * (dp - dsum_ref[0, 0][:, None]) * scale
        acc_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0] = acc_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(
    lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale, causal, use_lens, num_heads, block_q, block_k, seq_k,
    dropout_rate=0.0,
):
    hq = pl.program_id(0)  # read outside pl.when (interpret-mode cond limit)
    ik, iq, nq = pl.program_id(1), pl.program_id(2), pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    kv_len = lens_ref[1 + hq // num_heads] if use_lens else None
    q_start, k_start = iq * block_q, ik * block_k

    run = (k_start <= q_start + block_q - 1) if causal else True

    @pl.when(run if causal else True)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        do = do_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = _mask(q_start, k_start, block_q, block_k, seq_k, causal, kv_len)
        p = jnp.where(m, jnp.exp(s - lse_ref[0, 0][:, None]), 0.0)
        if dropout_rate > 0.0:
            keep = _keep_mask(lens_ref[0], hq, q_start, k_start,
                              block_q, block_k, seq_k, dropout_rate)
            inv = 1.0 / (1.0 - dropout_rate)
            p_d = jnp.where(keep, p, 0.0) * inv  # dropped probs (fwd's p_v)
        else:
            p_d = p
        dv_scr[:] += jax.lax.dot_general(
            p_d.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            dp = jnp.where(keep, dp, 0.0) * inv
        ds = p * (dp - dsum_ref[0, 0][:, None]) * scale
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd(
    q, k, v, o, do, lse,  # q/o/do: (B,T,Hq,D); k/v: (B,S,Hkv,D); lse (B*Hq, T)
    causal: bool,
    kv_lengths: Optional[jax.Array],
    scale: float,
    block_q: int,
    block_k: int,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
):
    B, T, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv

    s128 = _round_up(S, 128)
    block_q = min(block_q, _round_up(T, 128))
    block_k = s128 if s128 <= 1024 else min(block_k, s128)
    Tp, Sp = _round_up(T, block_q), _round_up(S, block_k)

    pad_t = ((0, 0), (0, Tp - T), (0, 0), (0, 0))
    pad_s = ((0, 0), (0, Sp - S), (0, 0), (0, 0))
    qf = jnp.pad(q, pad_t).transpose(0, 2, 1, 3).reshape(B * Hq, Tp, D)
    of = jnp.pad(o, pad_t).transpose(0, 2, 1, 3).reshape(B * Hq, Tp, D)
    dof = jnp.pad(do, pad_t).transpose(0, 2, 1, 3).reshape(B * Hq, Tp, D)
    kf = jnp.pad(k, pad_s).transpose(0, 2, 1, 3).reshape(B * Hkv, Sp, D)
    vf = jnp.pad(v, pad_s).transpose(0, 2, 1, 3).reshape(B * Hkv, Sp, D)
    lsef = jnp.pad(lse, ((0, 0), (0, Tp - T)), constant_values=1.0)[:, None]
    dsum = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32), axis=-1)[:, None]  # (BH, 1, Tp)

    seed = (jnp.asarray(dropout_seed, jnp.int32).reshape(1)
            if dropout_seed is not None else jnp.zeros((1,), jnp.int32))
    lens = (kv_lengths.astype(jnp.int32) if kv_lengths is not None
            else jnp.zeros((0,), jnp.int32))
    scalars = jnp.concatenate([seed, lens])
    kv_map = lambda h, a, b, lens, _G=G, _Hq=Hq, _Hkv=Hkv: (
        (h // _Hq) * _Hkv + (h % _Hq) // _G)

    common = dict(
        scale=float(scale), causal=causal, use_lens=kv_lengths is not None,
        num_heads=Hq, block_q=block_q, block_k=block_k, seq_k=S,
        dropout_rate=float(dropout_rate),
    )

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * Hq, Tp // block_q, Sp // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda h, iq, ik, l: (h, iq, 0)),
                pl.BlockSpec((1, block_k, D), lambda h, iq, ik, l: (kv_map(h, iq, ik, l), ik, 0)),
                pl.BlockSpec((1, block_k, D), lambda h, iq, ik, l: (kv_map(h, iq, ik, l), ik, 0)),
                pl.BlockSpec((1, block_q, D), lambda h, iq, ik, l: (h, iq, 0)),
                pl.BlockSpec((1, 1, block_q), lambda h, iq, ik, l: (h, 0, iq)),
                pl.BlockSpec((1, 1, block_q), lambda h, iq, ik, l: (h, 0, iq)),
            ],
            out_specs=pl.BlockSpec((1, block_q, D), lambda h, iq, ik, l: (h, iq, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B * Hq, Tp, D), q.dtype),
        interpret=interpret,
    )(scalars, qf, kf, vf, dof, lsef, dsum)

    dk_ph, dv_ph = pl.pallas_call(
        functools.partial(_dkv_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * Hq, Sp // block_k, Tp // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda h, ik, iq, l: (h, iq, 0)),
                pl.BlockSpec((1, block_k, D), lambda h, ik, iq, l: (kv_map(h, ik, iq, l), ik, 0)),
                pl.BlockSpec((1, block_k, D), lambda h, ik, iq, l: (kv_map(h, ik, iq, l), ik, 0)),
                pl.BlockSpec((1, block_q, D), lambda h, ik, iq, l: (h, iq, 0)),
                pl.BlockSpec((1, 1, block_q), lambda h, ik, iq, l: (h, 0, iq)),
                pl.BlockSpec((1, 1, block_q), lambda h, ik, iq, l: (h, 0, iq)),
            ],
            out_specs=(
                pl.BlockSpec((1, block_k, D), lambda h, ik, iq, l: (h, ik, 0)),
                pl.BlockSpec((1, block_k, D), lambda h, ik, iq, l: (h, ik, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_k, D), jnp.float32),
                pltpu.VMEM((block_k, D), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * Hq, Sp, D), k.dtype),
            jax.ShapeDtypeStruct((B * Hq, Sp, D), v.dtype),
        ),
        interpret=interpret,
    )(scalars, qf, kf, vf, dof, lsef, dsum)

    dq = dq.reshape(B, Hq, Tp, D).transpose(0, 2, 1, 3)[:, :T]
    # per-q-head dk/dv -> group-sum onto kv heads
    dk = dk_ph.reshape(B, Hkv, G, Sp, D).sum(axis=2).transpose(0, 2, 1, 3)[:, :S]
    dv = dv_ph.reshape(B, Hkv, G, Sp, D).sum(axis=2).transpose(0, 2, 1, 3)[:, :S]
    return dq, dk, dv


@functools.lru_cache(maxsize=16)
def _make_trainable(causal: bool, use_lens: bool, block_q: int, block_k: int,
                    interpret: bool, dropout_rate: float):
    @jax.custom_vjp
    def fn(q, k, v, lens, seed):
        return flash_attention(
            q, k, v, causal=causal, kv_lengths=lens if use_lens else None,
            block_q=block_q, block_k=block_k, interpret=interpret,
            dropout_rate=dropout_rate, dropout_seed=seed,
        )

    def fwd(q, k, v, lens, seed):
        o, lse = flash_attention(
            q, k, v, causal=causal, kv_lengths=lens if use_lens else None,
            block_q=block_q, block_k=block_k, interpret=interpret,
            return_lse=True,
            dropout_rate=dropout_rate, dropout_seed=seed,
        )
        return o, (q, k, v, o, lse, lens, seed)

    def bwd(res, do):
        q, k, v, o, lse, lens, seed = res
        D = q.shape[-1]
        dq, dk, dv = _flash_bwd(
            q, k, v, o, do, lse, causal,
            lens if use_lens else None, D ** -0.5, block_q, block_k, interpret,
            dropout_rate=dropout_rate, dropout_seed=seed,
        )
        return dq, dk, dv, None, None

    fn.defvjp(fwd, bwd)
    return fn


def flash_attention_trainable(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    kv_lengths: Optional[jax.Array] = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,  # int32 scalar, required if rate>0
) -> jax.Array:
    """Flash attention with a Pallas backward — safe under jax.grad.

    `dropout_rate`/`dropout_seed` apply torch-semantics attention-probs
    dropout INSIDE the kernels (position-hash mask, identical in fwd and
    both bwd kernels), so training configs with attention dropout active
    (fairseq `multihead_attention.py:389-494` keeps it on in train mode)
    no longer fall back to XLA attention."""
    assert dropout_rate == 0.0 or dropout_seed is not None, (
        "dropout_rate > 0 requires an int32 dropout_seed")
    fn = _make_trainable(causal, kv_lengths is not None, block_q, block_k,
                         interpret, float(dropout_rate))
    lens = kv_lengths if kv_lengths is not None else jnp.zeros((1,), jnp.int32)
    seed = (jnp.asarray(dropout_seed, jnp.int32).reshape(())
            if dropout_seed is not None else jnp.zeros((), jnp.int32))
    return fn(q, k, v, lens, seed)
