"""Tracing / profiling / NaN-detection utilities.

SURVEY.md §5 upgrades over the reference:
  - reference tracing = a single `torch.cuda.memory_summary()` print
    (`train_OmniAVSR.py:419`) -> here: `jax.profiler` trace contexts
    (xprof/tensorboard-compatible) + a per-step wall-clock timer
  - reference NaN detection = fairseq `NanDetector` module hooks (not wired)
    -> here: a jit-compatible NaN/Inf scan over a pytree, usable as a debug
    hook from the train loop, plus a `checkify`-wrapped step factory.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when profile_dir is None."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time stats (host wall clock between calls)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0


def count_nonfinite(tree: Any) -> jax.Array:
    """Total count of NaN/Inf leaves' elements — jit-safe, cheap reduce."""
    leaves = [
        jnp.sum(~jnp.isfinite(x.astype(jnp.float32)))
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
    ]
    if not leaves:
        return jnp.zeros((), jnp.int32)
    return sum(leaves)


def find_nonfinite(tree: Any, prefix: str = "") -> List[str]:
    """Host-side: names of subtrees containing NaN/Inf (first-NaN hunting,
    the fairseq NanDetector use-case)."""
    bad = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            bad += find_nonfinite(v, f"{prefix}.{k}" if prefix else k)
        return bad
    import numpy as np

    if hasattr(tree, "dtype") and jnp.issubdtype(tree.dtype, jnp.floating):
        arr = np.asarray(tree, np.float32)
        if not np.isfinite(arr).all():
            bad.append(prefix)
    return bad


def checkify_step(step_fn: Callable) -> Callable:
    """Wrap a step with jax.experimental.checkify NaN checks (debug mode)."""
    from jax.experimental import checkify

    checked = checkify.checkify(step_fn, errors=checkify.float_checks)

    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapped


def chain_iteration(batch: dict, acc, key: str = "audio") -> dict:
    """Thread a loop-carried dependency into a benchmark batch so XLA cannot
    hoist the body out of an on-device timing loop (`lax.fori_loop`).

    Adds `acc * 1e-38` to one input: numerically negligible (subnormal-scale
    against O(0.1) audio samples) but not provably zero, unlike a
    multiply-by-zero which the algebraic simplifier may fold, silently
    turning an n-iteration measurement into one iteration.
    """
    b = dict(batch)
    x = b[key]
    b[key] = x + acc.astype(x.dtype) * jnp.asarray(1e-38, x.dtype)
    return b
