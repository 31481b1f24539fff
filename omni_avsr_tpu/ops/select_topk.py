"""Pallas TPU one-pass row statistics for exact beam-candidate selection.

The fused beam-selection route (decode/decoding.py) needs, per logits row:
the row max, the softmax normalizer sum(exp(x - max)), and per-128-chunk
maxima (the exact top-k chunk prefilter of `topk_chunked`). XLA computes
these as 3 separate passes over the (B*K, V) f32 grid, and its 128-lane
segment-max lowering runs far off bandwidth (measured at batch 32 x beam
15: chunk-max pass ~2.0 ms vs the 0.3 ms one-pass roofline; reduce_window
1.3 ms — benchmarks/selection_breakdown.py). This kernel produces all three
in ONE pass: each grid step holds an (8, V) row block entirely in VMEM, so
chunk maxima, the row max and the normalizer come out of a single HBM read.

Exactness: chunk maxima and the row max are bit-equal to the XLA route
(same max over the same values). The normalizer's summation ORDER may
differ from XLA's flat jnp.sum, so `lse` can differ in the last ulp — the
same measure-zero tie class the fused route already documents.

Replaces the selection half of HF beam search's log_softmax + top-2K
(`Omni_AVSR/modeling_OmniAVSR.py:312-322` via transformers
BeamSearchScorer) on the TPU serving path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_CHUNK = 128
_RB = 8  # rows per grid step; (8, V) f32 block must fit VMEM twice


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def select_stats_supported(vocab_size: int) -> bool:
    """Needs 128-aligned chunks and an (8, V) f32 block that fits VMEM with
    double buffering (Llama-3's 128256 -> 4.1 MB blocks: fine; vocabs that
    are not 128-aligned — e.g. tokenizer-extended ones — take the XLA
    route)."""
    if vocab_size % _CHUNK != 0:
        return False
    return _RB * vocab_size * 4 * 2 <= 13 * 2**20


def _kernel(x_ref, cm_ref, mx_ref, se_ref):
    x = x_ref[...]  # (RB, V) f32 — the whole row block in VMEM
    RB, V = x.shape
    cm = jnp.max(x.reshape(RB, V // _CHUNK, _CHUNK), axis=-1)  # (RB, C)
    cm_ref[...] = cm
    mx = jnp.max(cm, axis=-1)  # (RB,)
    se = jnp.sum(jnp.exp(x - mx[:, None]), axis=-1)
    mx_ref[...] = jnp.broadcast_to(mx[:, None], mx_ref.shape)
    se_ref[...] = jnp.broadcast_to(se[:, None], se_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_stats_chunkmax(
    x: jax.Array, interpret: bool = False
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(R, V) f32 -> (chunk_max (R, V//128), row_max (R,), sum_exp (R,)).

    sum_exp is sum(exp(x - row_max)) over the row (lse = log(sum_exp)).
    Requires V % 128 == 0 (see select_stats_supported)."""
    R, V = x.shape
    assert V % _CHUNK == 0, V
    C = V // _CHUNK
    Rp = _round_up(R, _RB)
    x = x.astype(jnp.float32)
    if Rp != R:
        x = jnp.pad(x, ((0, Rp - R), (0, 0)), constant_values=NEG_INF)

    cm, mx, se = pl.pallas_call(
        _kernel,
        grid=(Rp // _RB,),
        in_specs=[pl.BlockSpec((_RB, V), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((_RB, C), lambda i: (i, 0)),
            pl.BlockSpec((_RB, _CHUNK), lambda i: (i, 0)),
            pl.BlockSpec((_RB, _CHUNK), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rp, C), jnp.float32),
            jax.ShapeDtypeStruct((Rp, _CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((Rp, _CHUNK), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x)
    return cm[:R], mx[:R, 0], se[:R, 0]
