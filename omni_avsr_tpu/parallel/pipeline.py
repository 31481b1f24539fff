"""Pipeline parallelism (GPipe schedule) over the scan-stacked LLM decoder.

The reference never activates pipeline parallelism (fairseq's
`--pipeline-model-parallel` path is dead on the AVSR recipes), but a
complete framework needs a PP axis for models whose layer stack outgrows a
single chip's HBM. This is the TPU-native construction: the stacked-layer
pytree (`models/llm.py::init_llm` — every layer leaf carries a leading
layer axis) is sharded over a `pp` mesh axis with `shard_map`, each stage
runs its local `lax.scan` slice, and activations hop stage→stage over ICI
with `jax.lax.ppermute`. Microbatches keep every stage busy: with M
microbatches and S stages the schedule runs M + S - 1 ticks (fill/drain
bubble = (S-1)/(M+S-1), amortised away as M grows).

Differentiable end-to-end: `ppermute` transposes to the reverse permute,
so `jax.grad` through the pipelined backbone yields exactly the layer
gradients of the unpipelined `llm_backbone` (pinned by
tests/test_pipeline.py), which is what makes this a drop-in training
option rather than an inference trick.

Composes with dp: batch shards over `dp` while layers shard over `pp`
(the microbatch loop runs on the per-dp-shard local batch).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LLMConfig
from ..models.llm import _decoder_layer, maybe_remat
from ..ops.attention import causal_mask
from ..ops.rope import rope_cos_sin

AXIS_PP = "pp"

Params = Any


@dataclasses.dataclass(frozen=True)
class PipelinePlan:
    """Static pipeline configuration threaded into the training forward
    (`models/llm.py::llm_backbone`): when set, the decoder layer stack runs
    the GPipe schedule below INSIDE the jitted train step — loss, gradients
    (exact, see module docstring) and the optimizer update all flow through
    the pipelined backbone. Built by `cli/common.py::setup_parallelism` from
    `--mesh-pp` / `--pp-microbatches`."""

    mesh: Mesh
    num_microbatches: int = 4
    axis: str = AXIS_PP
    dp_axis: Optional[str] = None


def pipeline_layer_specs(layers: Params, axis: str = AXIS_PP) -> Params:
    """PartitionSpec tree for a stacked-layer pytree: shard the leading
    (layer) axis over the pp mesh axis, replicate everything else."""
    return jax.tree_util.tree_map(
        lambda x: P(*([axis] + [None] * (x.ndim - 1))), layers)


def shard_layers(mesh: Mesh, layers: Params, axis: str = AXIS_PP) -> Params:
    specs = pipeline_layer_specs(layers, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        layers, specs, is_leaf=lambda x: isinstance(x, P))


def pipeline_backbone(
    mesh: Mesh,
    layers: Params,
    cfg: LLMConfig,
    inputs_embeds: jax.Array,  # (B, T, H)
    positions: Optional[jax.Array] = None,  # (B, T) int32
    modality: Optional[str] = None,
    num_microbatches: int = 4,
    remat: bool = True,
    axis: str = AXIS_PP,
    dp_axis: Optional[str] = None,
) -> jax.Array:
    """GPipe forward over the decoder stack; returns final hidden states
    (pre final-norm), bitwise the same layer math as
    `models/llm.py::llm_backbone` (causal mask route).

    `layers` is the stacked params["layers"] tree, layer axis sharded over
    `axis`. The batch must divide by num_microbatches (and by the dp axis
    size when `dp_axis` is given). Embedding / final-norm / lm_head stay
    outside — they are tiny next to the stack and live replicated.
    """
    B, T, H = inputs_embeds.shape
    M = num_microbatches
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    S = mesh.shape[axis]
    num_layers = jax.tree_util.tree_leaves(layers)[0].shape[0]
    if num_layers % S:
        raise ValueError(f"{num_layers} layers not divisible by pp={S}")
    if positions is None:
        positions = jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    x_mb = inputs_embeds.reshape(M, B // M, T, H)
    pos_mb = positions.reshape(M, B // M, T)

    mb_spec = P(None, dp_axis)  # microbatch axis unsharded; batch over dp
    in_specs = (pipeline_layer_specs(layers, axis), mb_spec, mb_spec)
    out_spec = mb_spec

    stage = functools.partial(
        _pipeline_stage, cfg=cfg, modality=modality, num_stages=S,
        num_microbatches=M, remat=remat, axis=axis)
    y_mb = jax.shard_map(
        stage, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
        check_vma=False,
    )(layers, x_mb, pos_mb)
    return y_mb.reshape(B, T, H)


def _pipeline_stage(local_layers, x_mb, pos_mb, *, cfg, modality,
                    num_stages, num_microbatches, remat, axis):
    """Per-stage program (runs replicated across the pp axis). x_mb is the
    (M, mb, T, H) microbatch stack; only stage 0 consumes it, only the last
    stage's outputs survive (psum-masked broadcast at the end)."""
    S, M = num_stages, num_microbatches
    stage_id = jax.lax.axis_index(axis)
    mb, T = x_mb.shape[1], x_mb.shape[2]
    mask = jnp.broadcast_to(causal_mask(T, T), (mb, 1, T, T))

    def run_local(x, pos):
        cos, sin = rope_cos_sin(cfg, pos)

        def body(h, layer):
            y, _ = _decoder_layer(layer, cfg, h, cos, sin, mask, modality)
            return y, None

        if remat:
            body = maybe_remat(body)
        y, _ = jax.lax.scan(body, x, local_layers)
        return y

    def tick(carry, t):
        recv, outputs = carry
        feed_idx = jnp.clip(t, 0, M - 1)
        inp = jnp.where(stage_id == 0, x_mb[feed_idx], recv)
        # Positions travel with the microbatch: stage s at tick t holds
        # microbatch t - s. Clip keeps the gather in-bounds during
        # fill/drain (those ticks' outputs are masked out below).
        pos = pos_mb[jnp.clip(t - stage_id, 0, M - 1)]
        out = run_local(inp, pos)
        nxt = jax.lax.ppermute(
            out, axis, [(i, (i + 1) % S) for i in range(S)])
        done_idx = jnp.clip(t - (S - 1), 0, M - 1)
        is_done = jnp.logical_and(t >= S - 1, stage_id == S - 1)
        upd = jnp.where(is_done, out, outputs[done_idx])
        outputs = jax.lax.dynamic_update_index_in_dim(outputs, upd, done_idx, 0)
        return (nxt, outputs), None

    init = (jnp.zeros_like(x_mb[0]), jnp.zeros_like(x_mb))
    (_, outputs), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
    # Results live on the last stage; replicate them so downstream
    # (final-norm + lm_head) runs without resharding.
    return jax.lax.psum(
        jnp.where(stage_id == S - 1, outputs, jnp.zeros_like(outputs)), axis)
