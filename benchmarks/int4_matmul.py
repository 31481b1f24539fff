"""Packed-int4 vs int8 decode-stream micro-benchmark (round 4).

Decode is weight-HBM-bound at ~95% of the achievable stream (ledger r3), so
bytes are the only lever: packed int4 halves the weight bytes but pays an
in-register nibble unpack (~5 VPU ops/byte). This times the three decode
weight streams at single-token shapes (M = batch*beams rows) on the real
chip, kernel vs the shipped int8 XLA route, chained on-device loops:

  python benchmarks/int4_matmul.py [M] [iters]

Go/no-go for wiring quantized_matmul4 into the decode path.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

PEAK_GBS = float(os.environ.get("OMNI_PEAK_GBS", "819"))


def main():
    sys.path.insert(0, ".")
    from omni_avsr_tpu.ops.quant import (
        pack_int4, quantize_per_channel, quantized_linear_xla,
        quantized_matmul, quantized_matmul4,
    )
    from omni_avsr_tpu.utils.profiling import chain_iteration

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N_IT = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    # Llama-1B decode streams: fused q|k|v, fused gate|up, down, lm_head
    shapes = {
        "qkv": (2048, 3072),
        "gateup": (2048, 16384),
        "down": (8192, 2048),
        "lm_head": (2048, 128256),
    }

    def timed(fn, *args):
        @jax.jit
        def loop(x, *rest):
            def it(i, acc):
                xx = chain_iteration({"x": x}, acc, key="x")["x"]
                return acc + jnp.sum(fn(xx, *rest).astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, N_IT, it, jnp.float32(0.0))
        float(loop(*args))
        t0 = time.perf_counter()
        float(loop(*args))
        return (time.perf_counter() - t0) / N_IT * 1e3

    # calibrate the ~30 ms relay dispatch+fetch out of the per-iter number
    x0 = jax.random.normal(jax.random.PRNGKey(9), (8, 128), jnp.bfloat16)
    null_ms = timed(lambda xx: xx, x0)
    print(json.dumps({"null_loop_ms_per_iter": round(null_ms, 4),
                      "iters": N_IT}), flush=True)

    results = {}
    for name, (K, N) in shapes.items():
        w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.02
        x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
        q8 = quantize_per_channel(w, bits=8)
        q4p = pack_int4(quantize_per_channel(w, bits=4), block_n=1024)
        bm = max(8, min(128, M))
        bk = 2048 if K >= 2048 else K  # whole-K tiles: fewer, bigger grid steps
        row = {
            "int8_xla": timed(quantized_linear_xla, x, q8),
            "int8_pallas": timed(
                lambda xx, qq: quantized_matmul(xx, qq, block_m=bm,
                                                block_k=bk, block_n=1024),
                x, q8),
            "int4_pallas": timed(
                lambda xx, qq: quantized_matmul4(xx, qq, block_m=bm,
                                                 block_k=bk), x, q4p),
        }
        row = {k: round(v - null_ms, 3) for k, v in row.items()}
        row["hbm_floor_int8_ms"] = round(K * N / 1e9 / PEAK_GBS * 1e3, 3)
        row["hbm_floor_int4_ms"] = round(K * N / 2 / 1e9 / PEAK_GBS * 1e3, 3)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    tot8 = sum(r["int8_xla"] for r in results.values())
    tot4 = sum(r["int4_pallas"] for r in results.values())
    print(json.dumps({"sum_int8_xla_ms": round(tot8, 3),
                      "sum_int4_pallas_ms": round(tot4, 3),
                      "speedup": round(tot8 / tot4, 2)}), flush=True)


if __name__ == "__main__":
    main()
