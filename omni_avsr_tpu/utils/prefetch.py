"""Host->device input prefetching.

Overlaps H2D transfer of the next batch with the current step's compute —
the JAX counterpart of the reference's DataLoader worker prefetch
(`data_module.py:156`), one level deeper (device, not host).
"""

from __future__ import annotations

import collections
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp


def device_prefetch(
    iterator: Iterator[Dict[str, Any]],
    depth: int = 2,
    sharding: Optional[Any] = None,
) -> Iterator[Dict[str, Any]]:
    """Eagerly device_put `depth` batches ahead. Non-array entries
    (static ints, gold_text lists) pass through untouched."""

    def put(batch: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        for k, v in batch.items():
            if hasattr(v, "shape") and hasattr(v, "dtype"):
                out[k] = jax.device_put(v, sharding) if sharding is not None else jnp.asarray(v)
            else:
                out[k] = v
        return out

    queue: collections.deque = collections.deque()
    for batch in iterator:
        queue.append(put(batch))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
