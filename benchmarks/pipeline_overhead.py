"""GPipe bubble amortisation: pipeline vs unpipelined backbone.

Runs the pp=2 pipeline (`parallel/pipeline.py`) against the plain
`llm_backbone` on the virtual 8-device CPU mesh at a mid-size geometry and
sweeps num_microbatches. CPU wall-times are NOT TPU predictions — the
point is the SHAPE of the curve: the bubble fraction (S-1)/(M+S-1) should
shrink as M grows, and the M=8 point should sit near the replicated
baseline's per-shard work. Usage:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python benchmarks/pipeline_overhead.py [layers] [T]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from jax.sharding import Mesh  # noqa: E402

from omni_avsr_tpu.config import LLMConfig  # noqa: E402
from omni_avsr_tpu.models import llm as L  # noqa: E402
from omni_avsr_tpu.parallel import pipeline as PL  # noqa: E402


def _time(f, *args, iters=5):
    f(*args)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    layers = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cfg = LLMConfig(
        vocab_size=512, hidden_size=512, intermediate_size=1408,
        num_layers=layers, num_heads=8, num_kv_heads=4, head_dim=64,
    )
    params = L.init_llm(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    B = 16
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.hidden_size),
                            jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    base = jax.jit(lambda p, e: L.llm_backbone(p, cfg, e, pos, mask=None,
                                               remat=False))
    t_base = _time(base, params, emb)
    print(f"baseline (replicated, 1-device work x8): {t_base:.1f} ms")

    devs = jax.devices()
    S = 2
    mesh = Mesh(np.asarray(devs[:8]).reshape(8 // S, S), ("dp", PL.AXIS_PP))
    layers_sh = PL.shard_layers(mesh, params["layers"])
    for M in (1, 2, 4, 8):
        pp = jax.jit(lambda l, e, M=M: PL.pipeline_backbone(
            mesh, l, cfg, e, num_microbatches=M, remat=False))
        t = _time(pp, layers_sh, emb)
        bubble = (S - 1) / (M + S - 1)
        print(f"pp=2 M={M}: {t:.1f} ms (ideal bubble {bubble:.0%})")


if __name__ == "__main__":
    main()
