"""Parameter partition specs (GSPMD) for the model zoo.

Rules are expressed as (path-regex -> PartitionSpec) tables matched against
dot-joined parameter paths, mirroring the idiom of t5x/maxtext partitioning.
The tp axis shards the big LLM matmuls (attention head dim / MLP hidden);
everything else is replicated. Batch activations shard over dp.

With dp=N, tp=1 this degenerates to pure data parallelism — the reference's
DDP (`train_OmniAVSR.py:38-56`) — with the gradient psum riding ICI.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_DP, AXIS_TP

# Order matters: first match wins. Weights are (in, out).
LLM_RULES: List[Tuple[str, P]] = [
    # attention: shard the head dim (out-features of q/k/v, in-features of o)
    (r".*attn\.q\.w$", P(None, AXIS_TP)),
    (r".*attn\.k\.w$", P(None, AXIS_TP)),
    (r".*attn\.v\.w$", P(None, AXIS_TP)),
    (r".*attn\.q\.b$", P(AXIS_TP)),
    (r".*attn\.k\.b$", P(AXIS_TP)),
    (r".*attn\.v\.b$", P(AXIS_TP)),
    (r".*attn\.o\.w$", P(AXIS_TP, None)),
    # LoRA: up-projections shard with their base matrices; downs replicate
    (r".*lora.*up_q\.w$", P(None, AXIS_TP)),
    (r".*lora.*up_v\.w$", P(None, AXIS_TP)),
    # MLP: gate/up shard out-features, down shards in-features
    (r".*mlp\.gate\.w$", P(None, AXIS_TP)),
    (r".*mlp\.up\.w$", P(None, AXIS_TP)),
    (r".*mlp\.down\.w$", P(AXIS_TP, None)),
    # embeddings / head: shard the vocab axis of the unembedding
    (r"^embed\.w$", P(None, None)),
    (r"^lm_head\.w$", P(None, AXIS_TP)),
]

# Encoder towers are small relative to the LLM; replicate by default but
# shard their FFNs when tp > 1.
ENCODER_RULES: List[Tuple[str, P]] = [
    (r".*fc1\.w$", P(None, AXIS_TP)),
    (r".*fc2\.w$", P(AXIS_TP, None)),
    (r".*fc1\.b$", P(AXIS_TP)),
]


def _spec_for(path: str, rules: List[Tuple[str, P]], ndim: int) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path):
            if len(spec) <= ndim:
                return spec
            break
    return P()


def _tree_specs(tree: Any, rules: List[Tuple[str, P]], prefix: str = "") -> Any:
    if isinstance(tree, dict):
        return {
            k: _tree_specs(v, rules, f"{prefix}.{k}" if prefix else k)
            for k, v in tree.items()
        }
    # leaf: stacked-layer leading axis (if any) is never sharded by rules;
    # our specs address trailing dims, so pad with None on the left when the
    # leaf has more dims than the spec mentions.
    spec = _spec_for(prefix, rules, tree.ndim)
    if len(spec) and tree.ndim > len(spec):
        spec = P(*([None] * (tree.ndim - len(spec)) + list(spec)))
    return spec


# FSDP / ZeRO-3 style: additionally shard every large matrix over the dp
# axis on its first (row) dim; XLA all-gathers per layer on use and
# reduce-scatters gradients — the GSPMD equivalent of the reference's
# commented-out FSDPStrategy (`train_OmniAVSR.py:19, 49`).
FSDP_EXTRA_RULES: List[Tuple[str, P]] = [
    (r".*attn\.q\.w$", P(AXIS_DP, AXIS_TP)),
    (r".*attn\.k\.w$", P(AXIS_DP, AXIS_TP)),
    (r".*attn\.v\.w$", P(AXIS_DP, AXIS_TP)),
    (r".*attn\.o\.w$", P(AXIS_TP, AXIS_DP)),
    (r".*mlp\.gate\.w$", P(AXIS_DP, AXIS_TP)),
    (r".*mlp\.up\.w$", P(AXIS_DP, AXIS_TP)),
    (r".*mlp\.down\.w$", P(AXIS_TP, AXIS_DP)),
    (r"^embed\.w$", P(AXIS_DP, None)),
    (r"^lm_head\.w$", P(AXIS_DP, AXIS_TP)),
    (r".*fc1\.w$", P(AXIS_DP, AXIS_TP)),
    (r".*fc2\.w$", P(AXIS_TP, AXIS_DP)),
] + LLM_RULES


# Expert-parallel rules (MoE decoder, `models/moe.py`): stacked expert
# weights (L, E, H, F) shard their expert dim over the ep mesh axis — the
# dispatch/combine einsums become an XLA all_to_all. Router gate replicates.
MOE_EP_RULES: List[Tuple[str, P]] = [
    (r".*moe\.experts\.(gate|up|down)\.w$", P("ep", None, None)),
]


def llm_partition_specs(params: Any, fsdp: bool = False, ep: bool = False) -> Any:
    rules = FSDP_EXTRA_RULES if fsdp else LLM_RULES
    if ep:
        rules = MOE_EP_RULES + rules
    return _tree_specs(params, rules)


def encoder_partition_specs(params: Any) -> Any:
    return _tree_specs(params, ENCODER_RULES)


# Decode/serving specs. The serving param tree is the MERGED tree
# ({"llm", "whisper", "avhubert", projectors, ...}), optionally int8-
# quantized: `ops/quant.py` replaces each big `w` with int8 IN PLACE and
# adds a per-out-channel scale vector `s` beside it — so the weight rules
# above still match, and the scales shard with their weight's out dim
# (replicated where the out dim is the contracted/unsharded one: o, down).
LLM_DECODE_RULES: List[Tuple[str, P]] = [
    (r".*attn\.(q|k|v)\.s$", P(AXIS_TP)),
    (r".*mlp\.(gate|up)\.s$", P(AXIS_TP)),
    (r"^lm_head\.s$", P(AXIS_TP)),
] + LLM_RULES

ENCODER_DECODE_RULES: List[Tuple[str, P]] = [
    (r".*fc1\.s$", P(AXIS_TP)),
] + ENCODER_RULES


def decode_partition_specs(merged: Any) -> Any:
    """Specs for a merged (and possibly quantized) serving param tree:
    tp-shard the LLM matmuls + encoder FFNs, replicate the rest. Batch
    stays unsharded (serving shards the model, not the data); GSPMD
    inserts the all-gathers/reduces inside the jitted decode program."""
    out = {}
    for k, v in merged.items():
        if k == "llm":
            out[k] = _tree_specs(v, LLM_DECODE_RULES)
        elif k in ("whisper", "avhubert"):
            out[k] = _tree_specs(v, ENCODER_DECODE_RULES)
        else:
            out[k] = _tree_specs(v, [])
    return out


def clamp_specs_to_shapes(mesh: Mesh, params: Any, specs: Any) -> Any:
    """Drop sharding on any dim whose size the mesh axis doesn't divide
    (GSPMD device_put requires divisibility). Flagship checkpoints divide
    on every rule above; this keeps tiny/test configs and odd vocab sizes
    runnable — the affected leaf just replicates, with a warning."""
    import math
    import warnings

    def axis_size(axis) -> int:
        names = axis if isinstance(axis, tuple) else (axis,)
        return math.prod(mesh.shape[n] for n in names)

    def one(x, s):
        if not isinstance(s, P) or not len(s):
            return s
        out, changed = [], False
        for dim, axis in enumerate(s):
            if axis is not None and x.shape[dim] % axis_size(axis):
                out.append(None)
                changed = True
            else:
                out.append(axis)
        if changed:
            warnings.warn(
                f"replicating dim(s) of leaf shape {x.shape}: {s} does not "
                f"divide under mesh {dict(mesh.shape)}", stacklevel=2)
        return P(*out)

    return jax.tree_util.tree_map(
        one, params, specs, is_leaf=lambda x: isinstance(x, P))


def shard_params(mesh: Mesh, params: Any, specs: Any) -> Any:
    """Device_put params according to spec tree."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def named_shardings(mesh: Mesh, specs: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
