"""Mixture-of-Experts FFN with expert parallelism (BASE-layer semantics).

The reference vendors fairseq's BASE layer (`fairseq/modules/base_layer.py`
+ the libbase `balanced_assignment.cpp` auction kernel) but never activates
it on the AVSR path. A complete framework keeps the capability; this is
the TPU-native construction:

  - Routing is top-1 with a per-expert CAPACITY (Switch/GShard style):
    position-in-expert via a cumsum over the one-hot dispatch, tokens past
    capacity fall through on the residual. Static shapes, no host sync —
    the compiler-friendly stand-in for BASE's exact balanced assignment
    (which needs a data-dependent LP per step). The exact auction solver
    IS available host-side (`utils/native.py::balanced_assignment_native`)
    for offline/eval-exact routing studies; `routing="balanced"` uses a
    sort-based greedy balancer in-jit that guarantees equal loads like
    BASE does.
  - Dispatch/combine are dense einsums over a [tokens, experts, capacity]
    one-hot — big MXU-shaped contractions instead of scatter/gather.
  - Expert parallelism is declarative GSPMD, like this repo's tp/fsdp:
    stacked expert weights [E, ...] shard over an "ep" mesh axis
    (`moe_partition_specs`), and XLA inserts the all_to_all implied by the
    dispatch einsum. No hand-written collectives.

Experts are SwiGLU MLPs matching the decoder's (`models/llm.py::_mlp_block`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

Params = Any

AXIS_EP = "ep"


def init_moe(
    rng: jax.Array,
    num_experts: int,
    hidden_size: int,
    ffn_dim: int,
    dtype=jnp.float32,
) -> Params:
    kg, k1, k2, k3 = jax.random.split(rng, 4)
    scale_in = hidden_size ** -0.5
    scale_ffn = ffn_dim ** -0.5
    return {
        "gate": {"w": jax.random.normal(kg, (hidden_size, num_experts), dtype) * scale_in},
        "experts": {
            "gate": {"w": jax.random.normal(k1, (num_experts, hidden_size, ffn_dim), dtype) * scale_in},
            "up": {"w": jax.random.normal(k2, (num_experts, hidden_size, ffn_dim), dtype) * scale_in},
            "down": {"w": jax.random.normal(k3, (num_experts, ffn_dim, hidden_size), dtype) * scale_ffn},
        },
    }


def moe_partition_specs(params: Params) -> Params:
    """Expert weights shard over the ep mesh axis on their leading (expert)
    dim; the router gate replicates."""
    return {
        "gate": {"w": P()},
        "experts": jax.tree_util.tree_map(
            lambda x: P(*([AXIS_EP] + [None] * (x.ndim - 1))),
            params["experts"]),
    }


def _topk_balanced_assignment(scores: jax.Array, capacity: int) -> jax.Array:
    """Greedy BALANCED top-1: visit tokens in descending best-score order,
    each takes its best expert with remaining capacity. In-jit equivalent
    of BASE's balanced objective (every expert ends with ~equal load);
    returns expert index per token, -1 when every preferred expert is full
    (cannot happen when capacity * E >= N)."""
    N, E = scores.shape
    order = jnp.argsort(-scores.max(axis=1))  # confident tokens pick first

    def body(carry, tok):
        load, assign = carry
        s = scores[tok] - jnp.where(load >= capacity, jnp.inf, 0.0)
        e = jnp.argmax(s)
        ok = s[e] > -jnp.inf
        e = jnp.where(ok, e, -1)
        load = load.at[jnp.maximum(e, 0)].add(jnp.where(ok, 1, 0))
        assign = assign.at[tok].set(e)
        return (load, assign), None

    (_, assign), _ = jax.lax.scan(
        body, (jnp.zeros(E, jnp.int32), jnp.full(N, -1, jnp.int32)), order)
    return assign


def moe_ffn(
    params: Params,
    x: jax.Array,  # (B, T, H) or (N, H)
    capacity_factor: float = 1.25,
    routing: str = "top1",  # "top1" (capacity-drop) | "balanced" (BASE-like)
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Top-1 MoE SwiGLU FFN. Returns (y, aux) where aux carries the
    load-balancing loss (GShard aux_loss: E * mean(frac_tokens * mean_prob))
    and per-expert loads. Dropped tokens contribute zero (residual add is
    the caller's job, as in the decoder block)."""
    orig_shape = x.shape
    H = orig_shape[-1]
    xt = x.reshape(-1, H)
    N = xt.shape[0]
    wg = params["gate"]["w"]
    E = wg.shape[1]
    capacity = max(1, int(-(-N // E) * capacity_factor))
    if routing == "balanced":
        capacity = -(-N // E)  # exact equal loads, nothing dropped

    logits = (xt @ wg.astype(xt.dtype)).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)

    if routing == "balanced":
        expert = _topk_balanced_assignment(logits, capacity)
    elif routing == "top1":
        expert = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    else:
        raise ValueError(f"unknown routing {routing!r}")

    onehot = jax.nn.one_hot(expert, E, dtype=jnp.float32)  # (N, E)
    pos = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot  # 0-based slot
    keep = (pos < capacity) & (onehot > 0)
    # (N, E, C) dispatch mask — one 1 per kept token
    disp = keep[..., None] * jax.nn.one_hot(pos.astype(jnp.int32), capacity,
                                            dtype=jnp.float32)
    gate_val = jnp.sum(probs * onehot * keep.any(axis=-1, keepdims=True), -1)

    xe = jnp.einsum("nec,nh->ech", disp, xt.astype(jnp.float32)).astype(x.dtype)
    ew = params["experts"]
    g = jnp.einsum("ech,ehf->ecf", xe, ew["gate"]["w"].astype(xe.dtype))
    u = jnp.einsum("ech,ehf->ecf", xe, ew["up"]["w"].astype(xe.dtype))
    h = jax.nn.silu(g) * u
    ye = jnp.einsum("ecf,efh->ech", h, ew["down"]["w"].astype(xe.dtype))
    y = jnp.einsum("nec,ech->nh", disp, ye.astype(jnp.float32))
    y = (y * gate_val[:, None]).astype(x.dtype)

    loads = onehot.sum(axis=0)
    aux_loss = E * jnp.mean((loads / N) * probs.mean(axis=0))
    aux = {"aux_loss": aux_loss, "loads": loads,
           "dropped": N - disp.sum()}
    return y.reshape(orig_shape), aux
