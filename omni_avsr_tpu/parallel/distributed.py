"""Multi-host (multi-process) scaffolding.

The reference trains multi-node with lightning DDP over SLURM
(`train_OmniAVSR.py:40-56` `--num_nodes`; fairseq
`distributed/utils.py:46-139` infers init_method/rank from SLURM env). The
JAX equivalent is one coordinator + N processes, a GLOBAL device mesh
spanning all hosts, and per-process feeding of each host's slice of the
global batch (`jax.make_array_from_process_local_data`); GSPMD inserts the
cross-host collectives.

Usage in the train CLIs:
  maybe_initialize_distributed(args)     # before any jax.devices() call
  mesh = make_mesh(...)                  # over jax.devices() = GLOBAL devices
  batch = global_batch_from_local(mesh, local_batch)   # per-host slice in

Each host's DataModule must yield only this host's rows: pass
`shard=(process_index(), process_count())` style slicing to the data layer
(see `host_shard_slice`).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_DP


def maybe_initialize_distributed(
    num_nodes: int = 1,
    coordinator_address: Optional[str] = None,
    node_rank: Optional[int] = None,
    cpu_collectives: Optional[str] = None,
) -> bool:
    """`jax.distributed.initialize` when multi-process training is requested.

    Returns True iff the distributed runtime was (already or newly)
    initialized. Resolution order mirrors fairseq's
    (`distributed/utils.py:46-139`): explicit flags > SLURM env > TPU-pod
    auto-detect (initialize() with no args on Cloud TPU).
    """
    if num_nodes <= 1 and coordinator_address is None and "SLURM_NNODES" not in os.environ:
        return False
    # NB: do NOT probe jax.process_count() here — it would initialize the
    # XLA backend, after which jax.distributed.initialize refuses to run.
    if jax.distributed.is_initialized():
        return True

    if cpu_collectives:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)

    kwargs = {}
    if coordinator_address is not None:
        if node_rank is None:
            node_rank = int(os.environ.get("SLURM_PROCID", os.environ.get("NODE_RANK", 0)))
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_nodes,
            process_id=node_rank,
        )
    elif "SLURM_NNODES" in os.environ:
        # jax's SLURM cluster-env auto-detect handles the rest
        pass
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" in str(e).lower():
            return True
        raise
    return True


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def host_shard_slice(n_items: int) -> slice:
    """Round-robin-free contiguous slice of a global item list for this
    host: host p of P takes items [p*k, (p+1)*k) with k = ceil(n/P) (the
    trailing host may get fewer). Deterministic and identical on all hosts."""
    p, P_ = jax.process_index(), jax.process_count()
    k = -(-n_items // P_)
    return slice(p * k, min(n_items, (p + 1) * k))


def global_batch_from_local(mesh: Mesh, local_batch: Any) -> Any:
    """Assemble a GLOBAL dp-sharded batch from this host's local rows.

    Single-process: plain device_put with batch sharding (identical result,
    no extra copy). Multi-process: every host passes its local shard whose
    leading dim is global_batch / process_count;
    `jax.make_array_from_process_local_data` stitches the global array."""
    sharding = NamedSharding(mesh, P(AXIS_DP))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), sharding), local_batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )
