"""Multi-HOST dry run: 2 processes x 4 CPU devices, gloo collectives.

Validates the multi-process scaffolding the reference gets from lightning
DDP/SLURM (`train_OmniAVSR.py:40-56`, fairseq `distributed/utils.py:46-139`):
`jax.distributed.initialize` + a GLOBAL 8-device (dp=4, tp=2) mesh spanning
both processes + per-host batch feeding via
`jax.make_array_from_process_local_data` — then ONE full Omni train step
(augs, encoders, 3 LLM forwards, AdamW) on tiny shapes.

  python benchmarks/dryrun_multihost.py            # parent: spawns 2 workers
  python benchmarks/dryrun_multihost.py --node-rank 0 --port 12355  # worker
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
N_PROC = 2
DEV_PER_PROC = 4


def worker(rank: int, port: int) -> None:
    sys.path.insert(0, ROOT)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", DEV_PER_PROC)

    import jax.numpy as jnp
    import numpy as np

    from omni_avsr_tpu.config import MeshConfig, TrainConfig
    from omni_avsr_tpu.data.noise import synth_babble
    from omni_avsr_tpu.parallel.distributed import (
        global_batch_from_local,
        host_shard_slice,
        is_primary,
        maybe_initialize_distributed,
    )
    from omni_avsr_tpu.parallel.mesh import make_mesh
    from omni_avsr_tpu.parallel.partitioning import llm_partition_specs, shard_params
    from omni_avsr_tpu.train.engine import OmniEngine

    ok = maybe_initialize_distributed(
        num_nodes=N_PROC, coordinator_address=f"localhost:{port}",
        node_rank=rank, cpu_collectives="gloo",
    )
    assert ok and jax.process_count() == N_PROC, (ok, jax.process_count())
    n_global = len(jax.devices())
    assert n_global == N_PROC * DEV_PER_PROC, n_global

    import __graft_entry__ as g

    mesh = make_mesh(MeshConfig(dp=4, tp=2))
    model = g._flagship(tiny=True)
    params = model.init_params(jax.random.PRNGKey(0), frozen_dtype=jnp.float32)
    with mesh:
        params["llm"] = shard_params(mesh, params["llm"],
                                     llm_partition_specs(params["llm"]))
        engine = OmniEngine(model, params, TrainConfig(lr=1e-3),
                            steps_per_epoch=10,
                            noise_bank=synth_babble(seconds=2.0), seed=0)
        B_global = 8
        full = g._batch(model, B=B_global, frames=16, token_len=8)
        # this host feeds ONLY its slice of the global batch
        sl = host_shard_slice(B_global)
        local = {k: np.asarray(v)[sl] for k, v in full.items()}
        batch = global_batch_from_local(mesh, local)
        batch["audio_trim_len"] = 25
        loss = float(engine.train_step(batch))
        assert np.isfinite(loss), loss
    if is_primary():
        print(f"dryrun_multihost ok: {N_PROC} procs x {DEV_PER_PROC} devs, "
              f"mesh={dict(mesh.shape)}, loss={loss:.4f}", flush=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--node-rank", type=int, default=None)
    p.add_argument("--port", type=int, default=0)
    args = p.parse_args()

    if args.node_rank is not None:
        worker(args.node_rank, args.port)
        return 0

    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers provision their own device counts
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--node-rank", str(r), "--port", str(port)],
            env=env, cwd=ROOT,
        )
        for r in range(N_PROC)
    ]
    codes = [q.wait(timeout=600) for q in procs]
    if any(codes):
        print(f"FAILED: worker exit codes {codes}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
