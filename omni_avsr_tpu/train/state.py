"""Train state: trainable/frozen parameter split and the jitted train step.

The reference trains three parameter regimes (`modeling_OmniAVSR.py:61, 148,
216, 234-260`): frozen encoders + frozen LLM, always-trainable
projectors/pools, and selectively unfrozen LoRA. Here that's a *path
predicate* splitting one param pytree into a trainable tree (f32, optimised)
and a frozen tree (bf16, closed over) — the JAX equivalent of
requires_grad_(False) that also halves frozen-weight HBM.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

Params = Dict[str, Any]
PathPredicate = Callable[[str], bool]


def default_trainable_predicate(path: str) -> bool:
    """Trainable = LoRA adapters + projectors (`_unfreeze_PETF`,
    `modeling_OmniAVSR.py:234-260`; projectors are never frozen)."""
    return ("lora" in path) or ("proj" in path)


def split_params(
    params: Params, is_trainable: PathPredicate, prefix: str = ""
) -> Tuple[Optional[Params], Optional[Params]]:
    """Split a nested dict into (trainable, frozen) trees. Empty subtrees
    become None (an empty pytree node in JAX)."""
    if not isinstance(params, dict):
        return (params, None) if is_trainable(prefix) else (None, params)
    t_out: Params = {}
    f_out: Params = {}
    for k, v in params.items():
        path = f"{prefix}.{k}" if prefix else k
        t, f = split_params(v, is_trainable, path)
        if t is not None:
            t_out[k] = t
        if f is not None:
            f_out[k] = f
    return (t_out or None), (f_out or None)


def merge_params(trainable: Optional[Params], frozen: Optional[Params]) -> Params:
    """Inverse of split_params."""
    if trainable is None:
        return frozen
    if frozen is None:
        return trainable
    if not isinstance(trainable, dict):
        return trainable
    out: Params = {}
    for k in set(trainable) | set(frozen):
        out[k] = merge_params(trainable.get(k), frozen.get(k))
    return out


class TrainState(NamedTuple):
    step: jax.Array
    trainable: Params
    opt_state: Any


def create_train_state(trainable: Params, tx: optax.GradientTransformation) -> TrainState:
    trainable = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), trainable)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        opt_state=tx.init(trainable),
    )


def make_train_step(
    loss_fn: Callable[..., jax.Array],
    tx: optax.GradientTransformation,
    compute_dtype=jnp.bfloat16,
):
    """Build a pure train step:
        (state, frozen, *batch_args) -> (state', loss)

    loss_fn(params, *batch_args) receives the merged tree with trainable
    leaves cast to compute_dtype (bf16-true semantics: master weights f32,
    compute bf16). Gradient reduction over the dp mesh axis is implicit in
    GSPMD (batch sharded over dp, params replicated => psum on backward).
    """

    def step_fn(state: TrainState, frozen: Optional[Params], *batch_args):
        def wrapped(trainable):
            t_cast = jax.tree_util.tree_map(lambda x: x.astype(compute_dtype), trainable)
            params = merge_params(t_cast, frozen)
            return loss_fn(params, *batch_args)

        loss, grads = jax.value_and_grad(wrapped)(state.trainable)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        return TrainState(state.step + 1, trainable, opt_state), loss

    return step_fn
