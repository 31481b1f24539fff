"""Persistent XLA compilation cache wiring.

The framework's static-shape discipline buys kernel-level performance at
the price of a cold-start compile per (bucket, rate_a, rate_v, task)
program — a cost the eager-torch reference never pays
(`train_OmniAVSR.py` recompiles nothing). `benchmarks/compile_budget.py`
measures the totals; this module is the mitigation: JAX's persistent
compilation cache makes every compile a once-per-machine cost — the
second cold start of the same recipe deserializes executables instead of
re-running XLA.

Enabled by `--compilation-cache-dir` on the CLIs or the
`OMNI_COMPILE_CACHE` env var (the flag wins).
"""

from __future__ import annotations

import os
from typing import Optional


def enable_persistent_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at `cache_dir` (or
    $OMNI_COMPILE_CACHE). Returns the directory enabled, or None.

    Safe to call multiple times; cheap no-op when no directory is
    configured. min_compile_time 1s skips caching trivial programs."""
    import jax

    cache_dir = cache_dir or os.environ.get("OMNI_COMPILE_CACHE")
    if not cache_dir:
        return None
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # cache regardless of backend (the default refuses some single-device
    # CPU cases); explicit opt-in implies the user wants it
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return cache_dir
