"""Device mesh and sharding helpers.

The reference scales with torch DDP over NCCL (`train_OmniAVSR.py:38-56`);
here parallelism is declarative: a `jax.sharding.Mesh` with a data axis
("dp") and a model axis ("tp"), `NamedSharding` annotations on params and
batches, and XLA GSPMD inserting the collectives (psum over ICI for grads,
all-gather for tp-sharded matmuls). FSDP-style parameter sharding is the
same mechanism with specs over the dp axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

AXIS_DP = "dp"
AXIS_TP = "tp"
AXIS_PP = "pp"
AXIS_EP = "ep"


def make_mesh(cfg: Optional[MeshConfig] = None, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (dp[, pp][, ep], tp) mesh. With cfg=None, uses all devices
    as dp. The dp/tp axes always exist (partition specs reference them);
    pp (pipeline stages, `parallel/pipeline.py`) and ep (MoE experts,
    `models/moe.py`) axes appear only when their size is > 1."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if cfg is None:
        cfg = MeshConfig(dp=n, tp=1)
    pp, ep = getattr(cfg, "pp", 1), getattr(cfg, "ep", 1)
    total = cfg.dp * cfg.tp * pp * ep
    assert total == n, f"mesh dp={cfg.dp} pp={pp} ep={ep} tp={cfg.tp} != {n} devices"
    shape = [cfg.dp] + ([pp] if pp > 1 else []) + ([ep] if ep > 1 else []) + [cfg.tp]
    names = ([AXIS_DP] + ([AXIS_PP] if pp > 1 else [])
             + ([AXIS_EP] if ep > 1 else []) + [AXIS_TP])
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; replicate the rest."""
    return NamedSharding(mesh, P(AXIS_DP))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a pytree of host arrays with batch-axis sharding."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def local_mesh_for_test(n: int = 8) -> Mesh:
    """An n-device mesh (requires XLA_FLAGS=--xla_force_host_platform_device_count=n)."""
    return make_mesh(MeshConfig(dp=max(1, n // 2), tp=min(2, n)))
