"""Shared parameter-tree utilities for the functional model zoo.

Models in this framework are pure functions over nested-dict parameter
pytrees (no module framework): `init_*(rng, cfg) -> params` plus
`*_forward(params, cfg, ...)`. This keeps pjit sharding annotations, torch
checkpoint conversion, and `lax.scan`-stacked layers all trivial.

Weights are stored in JAX convention: Linear weight has shape (in, out)
so application is `x @ w`. The torch converters transpose.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def linear(x: jax.Array, p: Params) -> jax.Array:
    """Apply a linear layer. p = {"w": (in,out)[, "b": (out,)]}.

    Transparently handles weight-only int8 leaves {"w": int8, "s": (out,)}
    (ops/quant.py): the convert fuses into the matmul read so int8 is what
    crosses HBM; the per-channel scale applies to the f32 accumulator.
    """
    if "w4" in p:  # packed-int4 nibble container (ops/quant.py::pack_int4)
        from ..ops.quant import quantized_matmul4

        lead = x.shape[:-1]
        xm = x.reshape(-1, x.shape[-1])
        bm = min(128, ((xm.shape[0] + 7) // 8) * 8)  # sublane-aligned M tile
        y = quantized_matmul4(xm, p, block_m=bm).reshape(*lead, -1)
        b = p.get("b")
        if b is not None:
            y = y + b.astype(x.dtype)
        return y
    w = p["w"]
    if w.dtype == jnp.int8:
        y = jnp.einsum(
            "...i,io->...o", x, w.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        y = (y * p["s"].astype(jnp.float32)).astype(x.dtype)
    else:
        y = x @ w.astype(x.dtype)
    b = p.get("b")
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def init_linear(
    rng: jax.Array,
    in_dim: int,
    out_dim: int,
    bias: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> Params:
    """torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) on weight,
    uniform(+-1/sqrt(fan_in)) on bias."""
    kw, kb = jax.random.split(rng)
    bound = math.sqrt(1.0 / in_dim)
    p: Params = {"w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def init_zeros_linear(in_dim: int, out_dim: int, dtype: jnp.dtype = jnp.float32) -> Params:
    return {"w": jnp.zeros((in_dim, out_dim), dtype)}


def init_kaiming_linear(rng: jax.Array, in_dim: int, out_dim: int, dtype: jnp.dtype = jnp.float32) -> Params:
    """kaiming_uniform(a=sqrt(5)), no bias — the reference's LoRA-up init
    (`Llama_LoRA.py:189-192`, `modeling_OmniAVSR.py:138-142`)."""
    bound = math.sqrt(1.0 / in_dim)
    return {"w": jax.random.uniform(rng, (in_dim, out_dim), dtype, -bound, bound)}


def init_layer_norm(dim: int, dtype: jnp.dtype = jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_rms_norm(dim: int, dtype: jnp.dtype = jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype)}


def split_rngs(rng: jax.Array, n: int) -> Iterator[jax.Array]:
    return iter(jax.random.split(rng, n))


def stack_layers(layer_params: Tuple[Params, ...]) -> Params:
    """Stack per-layer pytrees along a new leading axis for lax.scan."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *layer_params)


def layer_slice(stacked: Params, i: int) -> Params:
    return jax.tree_util.tree_map(lambda x: x[i], stacked)


def count_params(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def cast_tree(params: Params, dtype: jnp.dtype) -> Params:
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )


def tree_paths(params: Params, prefix: str = "") -> Iterator[Tuple[str, jax.Array]]:
    for k, v in params.items():
        path = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            yield from tree_paths(v, path)
        else:
            yield path, v
