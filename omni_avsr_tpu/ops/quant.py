"""Weight-only int8 quantization for the decode path.

Single-token decode on the 1B decoder is weight-bandwidth-bound: every step
streams ~2.5 GB of bf16 weights through HBM. Storing the frozen LLM matrices
as int8 with per-output-channel scales halves that traffic (~2x step-time
ceiling) at negligible WER cost (weight-only, symmetric per-channel).

Two execution paths behind one param format {"w": int8 (in,out), "s": f32 (out,)}:
  - XLA: (x @ w.astype(bf16)) * s — Mosaic/XLA fuses the convert into the
    matmul operand read, so int8 is what leaves HBM.
  - Pallas (`quantized_matmul`): explicit tiled kernel that DMAs int8 blocks
    to VMEM, dequantises in-register, and accumulates f32 on the MXU — used
    when profiling shows XLA materialising the bf16 weights.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_per_channel(w: jax.Array, bits: int = 8) -> Dict[str, jax.Array]:
    """(in, out) float -> {"w": int8, "s": f32 per-out-channel scale}.

    bits=4 emulates round-to-nearest int4 numerics in an int8 container
    (values in [-7, 7]): the dequant math and every downstream execution
    path are identical, so the WER impact of int4 RTN can be studied now
    even though the packed-int4 runtime is blocked by the dev relay
    (S4 buffer RecursionError — PARITY.md int4 note)."""
    qmax = float(2 ** (bits - 1) - 1)  # 127 int8 / 7 int4
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)  # (out,)
    scale = jnp.maximum(amax / qmax, 1e-12)
    q = jnp.clip(jnp.round(wf / scale[None, :]), -qmax, qmax).astype(jnp.int8)
    return {"w": q, "s": scale}


def dequantize(q: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    return (q["w"].astype(jnp.float32) * q["s"][None, :]).astype(dtype)


def quantized_linear_xla(x: jax.Array, q: Dict[str, jax.Array]) -> jax.Array:
    """y = x @ dequant(w); XLA path (convert fused into matmul read)."""
    w = q["w"].astype(x.dtype)
    y = jnp.einsum("...i,io->...o", x, w, preferred_element_type=jnp.float32)
    return (y * q["s"][None, :].astype(jnp.float32)).astype(x.dtype)


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # (BM, BK) bf16
    w = w_ref[:].astype(jnp.bfloat16)  # (BK, BN) int8 -> bf16 in VMEM
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ik == n_k - 1)
    def _finalize():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def quantized_matmul(
    x: jax.Array,  # (M, K) bf16/f32
    q: Dict[str, jax.Array],  # {"w": (K, N) int8, "s": (N,)}
    block_m: int = 128,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Pallas tiled int8-weight matmul; int8 is all that crosses HBM."""
    M, K = x.shape
    N = q["w"].shape[1]

    def rup(a, m):
        return ((a + m - 1) // m) * m

    Mp, Kp, Np = rup(M, block_m), rup(K, block_k), rup(N, block_n)
    xp = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    wp = jnp.pad(q["w"], ((0, Kp - K), (0, Np - N)))
    sp = jnp.pad(q["s"], (0, Np - N)).reshape(1, Np)

    grid = (Mp // block_m, Np // block_n, Kp // block_k)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, n_k=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        interpret=interpret,
    )(xp, wp, sp)
    return out[:M, :N]


# ---------------------------------------------------------------------------
# Packed int4: uint8 container, two weights per byte
# ---------------------------------------------------------------------------
#
# The dev relay cannot materialise S4 buffers (RecursionError in the plugin
# dispatch — PARITY.md int4 note), so the native jnp.int4 route is blocked.
# This path never creates an int4 buffer: weights are stored OFFSET-BINARY
# (w+8 in [0,15]) two-per-uint8 and unpacked in-register inside a Pallas
# kernel, so what crosses HBM is half the int8 byte count.
#
# Packing layout: columns are grouped in `block_n`-wide chunks matching the
# kernel's output tile; within a chunk the first half lives in the low
# nibble and the second half in the high nibble of the same byte column.
# The unpack is then PURE ELEMENTWISE on the loaded tile (no cross-lane
# interleave, the classic TPU int4 relayout trap) and the two halves feed
# two MXU dots into adjacent accumulator slices, keeping the output tile's
# columns in original order.


def pack_int4(q: Dict[str, jax.Array], block_n: int = 512) -> Dict[str, jax.Array]:
    """{"w": int8 in [-7,7] (K, N), "s": (N,)} (a quantize_per_channel
    bits=4 container) -> {"w4": uint8 (K, n_chunks, block_n//2), "s": (N,)}.

    All layout metadata lives in SHAPES (block_n = 2*w4.shape[-1], padded
    N = chunks*block_n, true N = s.shape[-1]) so the container stays a
    plain pytree usable under jit/scan/vmap."""
    w, s = q["w"], q["s"]
    K, N = w.shape
    bn2 = block_n // 2
    Np = ((N + block_n - 1) // block_n) * block_n
    wp = jnp.pad(w, ((0, 0), (0, Np - N)))
    g = wp.reshape(K, Np // block_n, 2, bn2)
    # Mixed nibble encodings, chosen so the kernel unpack is two MASKS +
    # two i8->bf16 converts and nothing else (Mosaic legalizes neither
    # 8-bit shifts — arith.shrsi on vector<i8> — nor uint8->bf16 casts):
    #   low  half-byte: OFFSET-BINARY lo+8 in [0,15]  -> (p & 0x0F) is
    #     positive in int8; the +8 folds into the output tile at finalize
    #     via the accumulated row-sum of x (dot(x, c+8) = dot(x,c)+8*rowsum)
    #   high half-byte: SIGNED hi in [-8,7]           -> (p & 0xF0) as a
    #     signed byte is EXACTLY 16*hi; the *16 folds into the scale.
    # The unpack is VPU-bound, so every per-byte op counts.
    lo = g[:, :, 0, :].astype(jnp.int32) + 8
    hi = (g[:, :, 1, :].astype(jnp.int32) & 0xF) << 4
    return {"w4": jax.lax.bitcast_convert_type(
        (lo | hi).astype(jnp.uint8), jnp.int8), "s": s}


def _qmm4_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, sx_ref,
                 *, n_k: int, bn2: int):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        sx_ref[:] = jnp.zeros_like(sx_ref)

    x = x_ref[:]  # (BM, BK) bf16
    p = w_ref[:]  # (BK, BN2) nibble pairs, int8 (see pack_int4 encoding)
    lo = (p & 0x0F).astype(x.dtype)  # lo+8 in [0,15], exact in bf16
    hi = (p & 0xF0).astype(x.dtype)  # == 16*hi in [-128,112], exact in bf16
    dn = (((1,), (0,)), ((), ()))
    acc_ref[:, :bn2] += jax.lax.dot_general(
        x, lo, dn, preferred_element_type=jnp.float32)
    acc_ref[:, bn2:] += jax.lax.dot_general(
        x, hi, dn, preferred_element_type=jnp.float32)
    sx_ref[:] += jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)

    @pl.when(ik == n_k - 1)
    def _finalize():
        # low half: dot(x, lo+8) = dot(x, lo) + 8*rowsum(x) -> subtract;
        # high half: accumulated 16*dot(x, hi) -> scale absorbs the /16
        sx = sx_ref[:]
        s = s_ref[:].astype(jnp.float32)
        o_ref[:, :bn2] = ((acc_ref[:, :bn2] - 8.0 * sx)
                          * s[:, :bn2]).astype(o_ref.dtype)
        o_ref[:, bn2:] = (acc_ref[:, bn2:]
                          * (s[:, bn2:] * 0.0625)).astype(o_ref.dtype)


def quantized_matmul4(
    x: jax.Array,  # (M, K) bf16/f32
    q4: Dict[str, jax.Array],  # pack_int4 output
    block_m: int = 128,
    block_k: int = 512,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """Pallas tiled packed-int4-weight matmul; int8 nibble pairs are all
    that crosses HBM for the weights (~half the int8 stream)."""
    from .attention import on_tpu

    interpret = interpret or not on_tpu()  # CPU: same kernel logic
    M, K = x.shape
    bn2 = int(q4["w4"].shape[-1])
    block_n = 2 * bn2
    N = int(q4["s"].shape[-1])
    w4 = q4["w4"].reshape(K, -1)
    Np2 = w4.shape[1]
    Np = 2 * Np2

    def rup(a, m):
        return ((a + m - 1) // m) * m

    Mp, Kp = rup(M, block_m), rup(K, block_k)
    xp = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    wp = jnp.pad(w4, ((0, Kp - K), (0, 0)))
    # scales, re-ordered to the packed column layout: chunk c's output tile
    # is [lo half | hi half] which IS original order within the chunk
    sp = jnp.pad(q4["s"], (0, Np - N)).reshape(1, Np)

    grid = (Mp // block_m, Np // block_n, Kp // block_k)
    out = pl.pallas_call(
        functools.partial(_qmm4_kernel, n_k=grid[2], bn2=bn2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, bn2), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32),
                        pltpu.VMEM((block_m, 1), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype or x.dtype),
        interpret=interpret,
    )(xp, wp, sp)
    return out[:M, :N]


# ---------------------------------------------------------------------------
# Param-tree quantization for decode
# ---------------------------------------------------------------------------


def quantize_llm_params(params: Dict, quantize_unembed: bool = True,
                        bits: int = 8) -> Dict:
    """Quantize the big frozen LLM matrices (layers' attn/mlp + unembedding)
    to int8; LoRA adapters, norms, biases, and the embed lookup table stay
    bf16/f32. For tied models an int8 unembedding COPY is installed under
    "lm_head" (models.llm.lm_head prefers it)."""
    quant = functools.partial(quantize_per_channel, bits=bits)
    out = dict(params)
    layers = dict(params["layers"])
    for blk_name in ("attn", "mlp"):
        blk = dict(layers[blk_name])
        for k, leaf in blk.items():
            # stacked (L, in, out) weights: vmap the per-matrix quantizer
            # so the scheme lives in exactly one place
            blk[k] = {**leaf, **jax.vmap(quant)(leaf["w"])}
        layers[blk_name] = blk
    out["layers"] = layers
    if quantize_unembed:
        if "lm_head" in params:
            out["lm_head"] = quant(params["lm_head"]["w"])
        else:  # tied embeddings: quantize a transposed copy for the head
            out["lm_head"] = quant(params["embed"]["w"].T)
    return out


def quantize_tower_params(params: Dict, bits: int = 8) -> Dict:
    """Quantize a frozen encoder tower's stacked transformer matrices (the
    `layers` subtree's attn q/k/v/o and fc weights, (L, in, out)) to int8.

    Everything else stays put: conv frontends and pos-conv (3-D weights too,
    but consumed by conv ops, not `linear` — they live OUTSIDE `layers`),
    norms/biases, and LoRA adapters (tiny traffic; skipped by name so their
    scaling math is untouched)."""
    quant = functools.partial(quantize_per_channel, bits=bits)

    def walk(node, in_layers: bool):
        if not isinstance(node, dict):
            return node
        w = node.get("w")
        if (in_layers and w is not None and hasattr(w, "ndim")
                and w.ndim == 3 and w.dtype != jnp.int8):
            return {**node, **jax.vmap(quant)(w)}
        return {
            k: (v if k == "lora" else walk(v, in_layers or k == "layers"))
            for k, v in node.items()
        }

    return walk(params, False)


def pack_llm_int4(llm: Dict, block_n: int = 512) -> Dict:
    """Convert every int4-RTN int8-container leaf {"w": int8, "s"} in a
    quantized (and optionally projection-fused) LLM tree to the packed
    uint8 nibble format {"w4", "s"} (stacked (L, ...) leaves vmapped).
    Run AFTER quantize_llm_params(bits=4) [+ fuse_decode_projections]:
    numerics are bit-identical to the int8-container emulation, so the
    scaled WER probe's int4 rows gate this runtime too."""

    def pack_leaf(leaf: Dict) -> Dict:
        w, s = leaf["w"], leaf["s"]
        if w.ndim == 2:
            packed = pack_int4({"w": w, "s": s}, block_n)
        else:  # stacked (L, in, out)
            packed = jax.vmap(
                lambda ww, ss: pack_int4({"w": ww, "s": ss}, block_n))(w, s)
        rest = {k: v for k, v in leaf.items() if k not in ("w", "s")}
        return {**rest, **packed}

    def walk(node):
        if not isinstance(node, dict):
            return node
        w = node.get("w")
        if w is not None and hasattr(w, "dtype") and w.dtype == jnp.int8 \
                and "s" in node:
            return pack_leaf(node)
        return {k: walk(v) for k, v in node.items()}

    return walk(llm)


def quantize_decode_params(merged: Dict, fuse_projections: bool = True,
                           bits: int = 8) -> Dict:
    """int8 weight-only quantization of ALL frozen decode-path weights:
    the LLM (quantize_llm_params) plus the Whisper and AV-HuBERT encoder
    towers. One call site for `--quantize-decode int8` / serving.

    fuse_projections concatenates q|k|v and gate|up into single decode
    streams (bit-exact, see fuse_decode_projections); pass False when the
    tree will be mesh-sharded (decode_partition_specs shards them apart).

    bits=4 runs the same pipeline at int4-RTN numerics (int8 container;
    see quantize_per_channel) — the WER-side study for the blocked packed
    runtime."""
    out = dict(merged)
    out["llm"] = quantize_llm_params(merged["llm"], bits=bits)
    if fuse_projections:
        out["llm"] = fuse_decode_projections(out["llm"])
    for tower in ("whisper", "avhubert"):
        if tower in merged:
            out[tower] = quantize_tower_params(merged[tower], bits=bits)
    return out


def quantize_for_decode(merged: Dict, mode: str,
                        fuse_projections: bool = True,
                        llm_only: bool = False) -> Dict:
    """One call site for the decode quantization modes:
      "int8" — weight-only int8 on LLM (+towers unless llm_only)
      "int4" — packed-int4 LLM (uint8 nibble container + Pallas kernel,
               relay-safe; see pack_llm_int4) + int8 towers; opt-in —
               measured slower than int8 on Mosaic toolchains without
               native S4 (docs/ROUND4_NOTES.md), shipped for runtimes
               that have it."""
    if mode is None or mode == "":
        return merged
    assert mode in ("int8", "int4"), mode
    out = dict(merged)
    bits = 4 if mode == "int4" else 8
    llm = quantize_llm_params(merged["llm"], bits=bits)
    if fuse_projections:
        llm = fuse_decode_projections(llm)
    out["llm"] = pack_llm_int4(llm) if mode == "int4" else llm
    if not llm_only:
        for tower in ("whisper", "avhubert"):
            if tower in merged:
                out[tower] = quantize_tower_params(merged[tower], bits=8)
    return out


def fuse_decode_projections(llm: Dict) -> Dict:
    """Concatenate q|k|v and gate|up along the output axis (stacked
    (L, in, out) trees, int8 or bf16) — the decode step then streams 4
    weight buffers per layer instead of 7. Bit-exact: a matmul's output
    columns are computed independently, so concatenating weight columns
    changes neither values nor per-column accumulation order
    (tests/test_fused_proj.py pins token identity).

    Decode-only: `_qkv_with_lora` / `_mlp_block` route on the presence of
    the "qkv"/"gateup" keys; training trees never carry them. Not applied
    under mesh sharding (decode_partition_specs shards q/k/v separately)."""

    def cat(entries):
        keys = entries[0].keys()
        assert all(e.keys() == keys for e in entries), "mismatched leaves"
        return {k: jnp.concatenate([e[k] for e in entries], axis=-1)
                for k in keys}

    out = dict(llm)
    layers = dict(llm["layers"])
    attn = dict(layers["attn"])
    attn["qkv"] = cat([attn.pop("q"), attn.pop("k"), attn.pop("v")])
    layers["attn"] = attn
    mlp = dict(layers["mlp"])
    mlp["gateup"] = cat([mlp.pop("gate"), mlp.pop("up")])
    layers["mlp"] = mlp
    out["layers"] = layers
    return out
