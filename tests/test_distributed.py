"""Multi-host scaffolding: single-process behaviour of parallel/distributed
plus a REAL 2-process x 4-device gloo run (slow, subprocess).

Reference equivalents: lightning DDP `--num_nodes` (`train_OmniAVSR.py:40-56`)
and fairseq's SLURM rank inference (`fairseq/distributed/utils.py:46-139`).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.parallel.distributed import (
    global_batch_from_local,
    host_shard_slice,
    is_primary,
    maybe_initialize_distributed,
)
from omni_avsr_tpu.parallel.mesh import local_mesh_for_test

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_single_process_defaults():
    assert maybe_initialize_distributed(num_nodes=1) is False
    assert is_primary()
    assert host_shard_slice(8) == slice(0, 8)


def test_global_batch_from_local_single_process():
    mesh = local_mesh_for_test(8)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4),
             "y": np.ones((8,), np.int32)}
    out = global_batch_from_local(mesh, batch)
    assert out["x"].shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    # dp-sharded over the mesh's data axis
    assert "dp" in str(out["x"].sharding.spec)


def test_setup_parallelism_tp_mesh_and_feed():
    """cli/common.setup_parallelism: tp>1 on the 8-device test platform
    builds the mesh, shards the LLM tree, and the feed makes global arrays."""
    import argparse

    from omni_avsr_tpu.cli.common import setup_parallelism
    from omni_avsr_tpu.config import LLMConfig, LoRAConfig
    from omni_avsr_tpu.models.llm import init_llm

    cfg = LLMConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                    lora=LoRAConfig(rank_divisor=8, v_out_divisor=2))
    params = {"llm": init_llm(jax.random.PRNGKey(0), cfg)}
    args = argparse.Namespace(mesh_tp=2, fsdp=False)
    mesh, feed, _ = setup_parallelism(args, params)
    assert mesh is not None and dict(mesh.shape) == {"dp": 4, "tp": 2}
    # q out-features sharded over tp
    q = params["llm"]["layers"]["attn"]["q"]["w"]
    assert "tp" in str(q.sharding.spec)

    batch = {"audio": np.zeros((8, 100), np.float32), "audio_trim_len": 25,
             "gold_text": ["a"] * 8}
    out = feed(batch)
    assert out["audio_trim_len"] == 25 and len(out["gold_text"]) == 8
    assert isinstance(out["audio"], jax.Array) and out["audio"].shape == (8, 100)


def test_setup_parallelism_fsdp():
    """--fsdp shards LLM matrices over dp on top of tp (ZeRO-3 style)."""
    import argparse

    from omni_avsr_tpu.cli.common import setup_parallelism
    from omni_avsr_tpu.config import LLMConfig, LoRAConfig
    from omni_avsr_tpu.models.llm import init_llm

    cfg = LLMConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                    lora=LoRAConfig(rank_divisor=8, v_out_divisor=2))
    params = {"llm": init_llm(jax.random.PRNGKey(0), cfg)}
    args = argparse.Namespace(mesh_tp=2, fsdp=True)
    mesh, _, _ = setup_parallelism(args, params)
    assert mesh is not None
    spec = str(params["llm"]["layers"]["attn"]["q"]["w"].sharding.spec)
    assert "dp" in spec and "tp" in spec


def test_setup_parallelism_identity_when_single():
    import argparse

    from omni_avsr_tpu.cli.common import setup_parallelism

    args = argparse.Namespace(mesh_tp=1, fsdp=False)
    mesh, feed, _ = setup_parallelism(args, {})
    assert mesh is None
    sentinel = {"x": 1}
    assert feed(sentinel) is sentinel


@pytest.mark.slow
def test_two_process_gloo_train_step():
    """Real multi-process run: 2 x 4 CPU devices, jax.distributed + gloo,
    global (4,2) mesh, per-host batch feeding, one full Omni train step.

    No retry: the old flake was (a) a parent-probed port racing other
    processes and (b) worker teardown hanging after a successful step —
    both fixed in benchmarks/dryrun_multihost.py (rank-0-owned file
    rendezvous; shutdown + watchdog hard-exit)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers provision their own device counts
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks", "dryrun_multihost.py")],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0 and "dryrun_multihost ok" in r.stdout, (
        r.returncode, r.stdout[-2000:], r.stderr[-2000:])
