"""MoE FFN + expert parallelism (BASE-layer capability).

Reference behaviour spec: fairseq `modules/base_layer.py` +
`clib/libbase/balanced_assignment.cpp` (vendored, inactive on the AVSR
recipes). Pins: routing respects capacity, balanced mode drops nothing and
equalises loads, a dense reference computation matches the einsum
dispatch/combine, gradients flow to all expert weights, and the ep-sharded
forward on an 8-device mesh is value-identical to single-device.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from omni_avsr_tpu.models import moe as M
from omni_avsr_tpu.utils.native import balanced_assignment_native


def _setup(E=4, H=16, F=32, B=2, T=16):
    params = M.init_moe(jax.random.PRNGKey(0), E, H, F)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H), jnp.float32)
    return params, x


def _dense_reference(params, x, expert, gate_val, kept):
    """Per-token loop: run each KEPT token through its expert's SwiGLU."""
    xt = np.asarray(x).reshape(-1, x.shape[-1])
    ew = jax.tree_util.tree_map(np.asarray, params["experts"])
    y = np.zeros_like(xt)
    for n in range(xt.shape[0]):
        if not kept[n]:
            continue
        e = int(expert[n])
        g = xt[n] @ ew["gate"]["w"][e]
        u = xt[n] @ ew["up"]["w"][e]
        h = (g / (1 + np.exp(-g))) * u
        y[n] = (h @ ew["down"]["w"][e]) * float(gate_val[n])
    return y.reshape(x.shape)


def test_top1_matches_dense_reference():
    params, x = _setup()
    y, aux = M.moe_ffn(params, x, capacity_factor=4.0)  # nothing dropped
    xt = x.reshape(-1, x.shape[-1])
    logits = np.asarray(xt @ params["gate"]["w"])
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    expert = logits.argmax(-1)
    gate_val = probs[np.arange(len(expert)), expert]
    ref = _dense_reference(params, x, expert, gate_val,
                           kept=np.ones(len(expert), bool))
    assert float(aux["dropped"]) == 0
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-5)


def test_capacity_drops_overflow():
    params, x = _setup(E=4, B=1, T=16)
    # capacity_factor 0.25 -> capacity 1 per expert -> at most 4 kept
    y, aux = M.moe_ffn(params, x, capacity_factor=0.25)
    assert float(aux["dropped"]) >= 16 - 4
    # dropped tokens produce exactly zero output
    xt_kept = np.asarray(y).reshape(-1, y.shape[-1])
    n_nonzero = (np.abs(xt_kept).sum(-1) > 0).sum()
    assert n_nonzero <= 4


def test_balanced_routing_equalises_loads():
    params, x = _setup(E=4, B=2, T=16)  # N=32, 8 per expert
    y, aux = M.moe_ffn(params, x, routing="balanced")
    loads = np.asarray(aux["loads"])
    assert float(aux["dropped"]) == 0
    np.testing.assert_array_equal(loads, np.full(4, 8.0))


def test_balanced_routing_prefers_high_scores():
    """The greedy balancer and the exact native auction agree on an easy
    block-diagonal instance (each expert clearly owns N/E tokens)."""
    E, per = 4, 4
    N = E * per
    scores = np.full((N, E), -5.0, np.float32)
    for e in range(E):
        scores[e * per:(e + 1) * per, e] = 5.0
    assign_jax = np.asarray(M._topk_balanced_assignment(
        jnp.asarray(scores), capacity=per))
    auction = balanced_assignment_native(scores)  # [w*k..] = jobs of worker w
    expected = np.repeat(np.arange(E), per)
    np.testing.assert_array_equal(assign_jax, expected)
    for e in range(E):
        assert sorted(auction[e * per:(e + 1) * per].tolist()) == list(
            range(e * per, (e + 1) * per))


def test_gradients_flow_to_all_experts():
    params, x = _setup(E=4, B=2, T=32)

    def loss(p):
        y, aux = M.moe_ffn(p, x, routing="balanced")
        return jnp.sum(y ** 2) + 0.01 * aux["aux_loss"]

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g["experts"]):
        per_expert = np.abs(np.asarray(leaf)).sum(axis=tuple(range(1, leaf.ndim)))
        assert (per_expert > 0).all(), "an expert received no gradient"
    assert np.abs(np.asarray(g["gate"]["w"])).sum() > 0


def test_ep_sharded_matches_single_device():
    params, x = _setup(E=8, H=16, F=32, B=2, T=16)
    ref, _ = M.moe_ffn(params, x, capacity_factor=2.0)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", M.AXIS_EP))
    specs = M.moe_partition_specs(params)
    sharded = jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda v: isinstance(v, P))
    with mesh:
        xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
        y, _ = jax.jit(lambda p, a: M.moe_ffn(p, a, capacity_factor=2.0))(
            sharded, xs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
