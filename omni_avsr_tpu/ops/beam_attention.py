"""Pallas TPU fused beam-decode attention (split cache + ancestor table).

One program per batch item computes the ENTIRE per-step beam attention —
[shared prefix | per-beam generated | current token] logits, joint softmax,
and the value contraction — for every kv head (static unrolled loop),
entirely in VMEM.

Two ideas beyond the XLA route (`models/llm.py::_merged_beam_attention`):

1. **No HBM intermediates.** The XLA route materialises f32 logit and
   probability tensors between einsums — ~6x the K/V-read roofline at
   serving shapes (benchmarks/llm_step_breakdown.py: 5.1 ms vs 0.84 ms at
   batch 32 x beam 15). Here only q, K/V, and the output cross HBM.

2. **No physical cache reorder.** HF-style beam search permutes the
   generated K/V by parent beam every step (`SplitCache.reorder`) — a
   ~1 GB/step gather at batch 32. This kernel instead takes the cache
   UNPERMUTED plus an ancestor table `anc[b, k, n]` = which cache row
   holds beam k's token for slot n. The generated-block logits are one
   (K*G, K*N) cross matmul; the ancestor mask keeps exactly the entries
   the reordered cache would have produced (masked lanes get -inf before
   the softmax, so this is exact), and the cross-matmul FLOPs it wastes
   are negligible (<4 MFLOP/program). The table itself is (B, K, N) int32
   — bytes, not gigabytes, per step.

Layouts are chosen so every DMA is one contiguous block per program:
gen cache (B, Hkv, K, N, D), prefix (B, Hkv, P, D), q/out (B, Hkv, K*G, D)
— per-head in-kernel views are leading-dim static slices and adjacent-dim
merges (relayout-free).

Replaces the per-step attention + cache reorder of the reference's HF
`model.generate` beam search (`Omni_AVSR/modeling_OmniAVSR.py:312-322`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    step_ref,  # scalar prefetch: (1,) int32 — current generation step
    q_ref,  # (1, Hkv, KGp, D)
    pk_ref,  # (1, Hkv, P, D)
    pv_ref,  # (1, Hkv, P, D)
    gk_ref,  # (1, Hkv, K, N, D)
    gv_ref,  # (1, Hkv, K, N, D)
    kc_ref,  # (1, Hkv, K, D)
    vc_ref,  # (1, Hkv, K, D)
    pb_ref,  # (1, 1, P) f32 — prefix mask bias (0 valid / NEG_INF invalid)
    anc_ref,  # (1, K, N) int32 — ancestor row per (beam, slot)
    o_ref,  # (1, Hkv, KGp, D)
    *,
    K: int,
    G: int,
    N: int,
    Hkv: int,
    scale: float,
):
    step = step_ref[0]
    KGp = q_ref.shape[2]
    KG = K * G
    dots = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32)

    # masks are head-independent — build once.
    # gen block: row r = (beam rb, q-head-in-group), col c = (cache row cb,
    # slot sl). Entry is live iff cb is rb's ancestor at slot sl and the
    # slot is strictly before this step.
    anc = anc_ref[0]  # (K, N)
    anc_rows = jnp.repeat(anc, G, axis=0)  # (KG, N): row r -> anc[r // G]
    if KGp != KG:
        anc_rows = jnp.pad(anc_rows, ((0, KGp - KG), (0, 0)),
                           constant_values=-1)
    anc_tiled = jnp.tile(anc_rows, (1, K))  # (KGp, K*N): col c -> [:, c % N]
    col_row = jax.lax.broadcasted_iota(jnp.int32, (KGp, K * N), 1) // N
    slot = jax.lax.broadcasted_iota(jnp.int32, (KGp, K * N), 1) % N
    gmask = (anc_tiled == col_row) & (slot < step)
    row_b = jax.lax.broadcasted_iota(jnp.int32, (KGp, K), 0) // G
    col_b = jax.lax.broadcasted_iota(jnp.int32, (KGp, K), 1)
    cmask = row_b == col_b
    pb = pb_ref[0, 0][None, :]  # (1, P)

    for h in range(Hkv):  # static unroll; all slices leading-dim, free
        q = q_ref[0, h]  # (KGp, D)
        lp = dots(q, pk_ref[0, h], (((1,), (1,)), ((), ()))) * scale + pb
        gk = gk_ref[0, h].reshape(K * N, -1)  # adjacent-dim merge: free
        lg = dots(q, gk, (((1,), (1,)), ((), ()))) * scale
        lg = jnp.where(gmask, lg, NEG_INF)
        # K == 1 (greedy reuses this kernel): the (KGp, 1) rank-1 dot trips
        # Mosaic's vector.broadcast verifier — use an elementwise reduce
        if K == 1:
            lc = jnp.sum(
                q.astype(jnp.float32) * kc_ref[0, h].astype(jnp.float32),
                axis=1, keepdims=True) * scale
        else:
            lc = dots(q, kc_ref[0, h], (((1,), (1,)), ((), ()))) * scale
        lc = jnp.where(cmask, lc, NEG_INF)

        m = jnp.maximum(
            jnp.maximum(jnp.max(lp, axis=1), jnp.max(lg, axis=1)),
            jnp.max(lc, axis=1),
        )[:, None]
        ep = jnp.exp(lp - m)
        eg = jnp.exp(lg - m)
        ec = jnp.exp(lc - m)
        denom = (ep.sum(axis=1) + eg.sum(axis=1) + ec.sum(axis=1))[:, None]

        vdt = pv_ref.dtype
        acc = dots(ep.astype(vdt), pv_ref[0, h], (((1,), (0,)), ((), ())))
        acc += dots(eg.astype(vdt), gv_ref[0, h].reshape(K * N, -1),
                    (((1,), (0,)), ((), ())))
        if K == 1:  # rank-1 outer product, same Mosaic verifier issue
            acc += ec.astype(jnp.float32) * vc_ref[0, h].astype(jnp.float32)
        else:
            acc += dots(ec.astype(vdt), vc_ref[0, h], (((1,), (0,)), ((), ())))
        o_ref[0, h] = (acc / denom).astype(o_ref.dtype)


def beam_attn_supported(head_dim: int) -> bool:
    """TPU-shape gate, mirroring the flash kernel's (ops/attention.py)."""
    return head_dim in (64, 128)


def beam_attn_shardable(num_heads: int, num_kv_heads: int, mesh,
                        axis: str = "tp") -> bool:
    """Can the kernel run per-shard under `mesh`'s model-parallel axis?
    Heads are the tp dimension of the q/k/v projections
    (parallel/partitioning.py::LLM_DECODE_RULES) — the kernel is
    embarrassingly parallel over kv heads, so it shards iff the head
    counts divide the axis."""
    if mesh is None:
        return True
    tp = dict(mesh.shape).get(axis, 1)
    return num_heads % tp == 0 and num_kv_heads % tp == 0


def beam_decode_attention(
    q: jax.Array,  # (B*K, 1, Hq, D)
    pk: jax.Array,  # (B, Hkv, P, D)
    pv: jax.Array,
    gk: jax.Array,  # (B, Hkv, K, N, D) — UNPERMUTED physical rows
    gv: jax.Array,
    k_cur: jax.Array,  # (B*K, Hkv, D)
    v_cur: jax.Array,
    prefix_bias: jax.Array,  # (B, P) f32 — 0 valid / NEG_INF invalid
    anc: jax.Array,  # (B, K, N) int32 ancestor rows
    step: jax.Array,  # int32 scalar
    num_beams: int,
    interpret: bool = False,
    mesh=None,  # jax.sharding.Mesh: run the kernel PER-SHARD via shard_map
    mesh_axis: str = "tp",
) -> jax.Array:
    """Fused split-cache beam attention. Logically equivalent to
    `_merged_beam_attention` run on a cache physically reordered so that
    row k holds beam k's ancestor chain (gen slots < step live; the
    current token is its own block).

    With `mesh`, the pallas call is wrapped in `jax.shard_map` splitting
    the KV-HEAD dim over `mesh_axis` — per-head softmax needs no
    collectives, so tp-sharded serving keeps the kernel route instead of
    falling back to XLA attention (GSPMD cannot partition a custom call
    by itself). Requires Hq % tp == Hkv % tp == 0 (`beam_attn_shardable`)."""
    if mesh is not None and dict(mesh.shape).get(mesh_axis, 1) > 1:
        from jax.sharding import PartitionSpec as P

        Hq, Hkv = q.shape[2], pk.shape[1]
        assert beam_attn_shardable(Hq, Hkv, mesh, mesh_axis), (
            f"heads ({Hq}, {Hkv}) not divisible by mesh axis "
            f"{mesh_axis}={dict(mesh.shape)[mesh_axis]}")
        inner = functools.partial(
            beam_decode_attention, num_beams=num_beams, interpret=interpret)
        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(
                P(None, None, mesh_axis, None),        # q: split Hq
                P(None, mesh_axis, None, None),        # pk: split Hkv
                P(None, mesh_axis, None, None),        # pv
                P(None, mesh_axis, None, None, None),  # gk
                P(None, mesh_axis, None, None, None),  # gv
                P(None, mesh_axis, None),              # k_cur
                P(None, mesh_axis, None),              # v_cur
                P(None, None),                         # prefix_bias: replicated
                P(None, None, None),                   # anc: replicated
                P(),                                   # step: replicated
            ),
            out_specs=P(None, None, mesh_axis, None),
            # pallas_call does not annotate vma on its output aval; the
            # out_specs declaration above is the ground truth
            check_vma=False,
        )(q, pk, pv, gk, gv, k_cur, v_cur, prefix_bias,
          anc.astype(jnp.int32), jnp.asarray(step, jnp.int32))

    from .attention import on_tpu

    BK, _, Hq, D = q.shape
    K = num_beams
    B = BK // K
    Hkv, P = pk.shape[1], pk.shape[2]
    N = gk.shape[3]
    G = Hq // Hkv
    KG = K * G
    KGp = _round_up(KG, 8)
    scale = D ** -0.5
    interpret = interpret or not on_tpu()  # CPU: run the same kernel logic

    qt = q.reshape(B, K, Hkv, G, D).transpose(0, 2, 1, 3, 4).reshape(B, Hkv, KG, D)
    if KGp != KG:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, KGp - KG), (0, 0)))
    kct = k_cur.reshape(B, K, Hkv, D).transpose(0, 2, 1, 3)  # (B, Hkv, K, D)
    vct = v_cur.reshape(B, K, Hkv, D).transpose(0, 2, 1, 3)

    kern = functools.partial(_kernel, K=K, G=G, N=N, Hkv=Hkv,
                             scale=float(scale))
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Hkv, KGp, D), lambda b, s: (b, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, P, D), lambda b, s: (b, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, P, D), lambda b, s: (b, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, K, N, D), lambda b, s: (b, 0, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, K, N, D), lambda b, s: (b, 0, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, K, D), lambda b, s: (b, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, K, D), lambda b, s: (b, 0, 0, 0)),
                pl.BlockSpec((1, 1, P), lambda b, s: (b, 0, 0)),
                pl.BlockSpec((1, K, N), lambda b, s: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Hkv, KGp, D), lambda b, s: (b, 0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, KGp, D), q.dtype),
        interpret=interpret,
    )(jnp.asarray(step, jnp.int32).reshape(1), qt, pk, pv, gk, gv,
      kct, vct, prefix_bias.astype(jnp.float32).reshape(B, 1, P),
      anc.astype(jnp.int32))

    out = out[:, :, :KG].reshape(B, Hkv, K, G, D).transpose(0, 2, 1, 3, 4)
    return out.reshape(BK, 1, Hq, D)
