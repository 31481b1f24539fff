"""Per-layer ResNet3D attribution + roofline (VERDICT r3 item 6).

The resnet stage is the worst-MFU train stage (20.8 ms @ ~20% at B12 F128,
docs/ROUND3_NOTES.md "true numbers").  Round 3's flat Pallas conv kernel was
a measured NEGATIVE (launch serialization); this benchmark decides whether a
second kernel attempt can pay at all, by attributing the stage to
stem/pool/layer1..4 with on-device chained loops (no relay dispatch floor)
and comparing each piece against a roofline floor:

  compute floor = analytic conv GFLOPs / bf16 peak (197 TFLOP/s v5e)
  memory  floor = approximate HBM traffic / 819 GB/s
    train block ~ in + 8*out  (conv raw out write, one-pass stats fused,
                               normalize read+write, conv2 same, residual)
    eval  block ~ in + 4*out  (BN folded into the conv epilogue)

Also A/Bs the one-pass BN-stats formulation (OMNI_BN_STATS=onepass, the
default in models/resnet3d.py::_bn) against the two-pass jnp.var form, at
layer granularity and on the whole stage.

  python benchmarks/resnet_breakdown.py [batch] [frames] [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

PEAK_TFLOPS = float(os.environ.get("OMNI_PEAK_TFLOPS", "197"))
PEAK_GBS = float(os.environ.get("OMNI_PEAK_GBS", "819"))


def conv_gflops(h, w, cin, cout, k=3):
    return 2.0 * h * w * k * k * cin * cout / 1e9


def main():
    sys.path.insert(0, ".")
    from omni_avsr_tpu.models import resnet3d
    from omni_avsr_tpu.utils.profiling import chain_iteration

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    train_mode = os.environ.get("OMNI_RESNET_EVAL") != "1"

    params = resnet3d.init_resnet3d(jax.random.PRNGKey(0), "prelu")
    video = jax.random.normal(jax.random.PRNGKey(1),
                              (B, frames, 88, 88, 1), jnp.bfloat16)

    NF = B * frames  # frames folded into batch for the 2D trunk

    # ---- forward to capture the per-layer inputs at bf16 (the bodies are
    # the model's own stem_pool / trunk_layer, so rewrites are measured)
    def stem_pool(v):
        return resnet3d.stem_pool(params, v, train_mode)

    def layer(name, _stride=None):
        def f(x):
            return resnet3d.trunk_layer(params, name, x, train_mode)
        return f

    x0 = jax.jit(stem_pool)(video)
    x1 = jax.jit(layer("layer1"))(x0)
    x2 = jax.jit(layer("layer2"))(x1)
    x3 = jax.jit(layer("layer3"))(x2)
    inputs = {"stem_pool": video, "layer1": x0, "layer2": x1,
              "layer3": x2, "layer4": x3}
    # materialize (axon: fetch, don't trust block_until_ready)
    for v in inputs.values():
        float(jnp.sum(v.astype(jnp.float32)))

    bodies = {
        "stem_pool": stem_pool,
        "layer1": layer("layer1"),
        "layer2": layer("layer2"),
        "layer3": layer("layer3"),
        "layer4": layer("layer4"),
    }

    def timed(body, inp):
        @jax.jit
        def loop(b):
            def it(i, acc):
                bb = chain_iteration({"x": b}, acc, key="x")["x"]
                return acc + jnp.sum(body(bb).astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, N, it, jnp.float32(0.0))
        float(loop(inp))
        t0 = time.perf_counter()
        float(loop(inp))
        return (time.perf_counter() - t0) / N * 1e3

    # ---- rooflines
    bytes_f = 2.0  # bf16
    def block_cost(h_in, w_in, h, w, cin, cout, downsample):
        gf = conv_gflops(h, w, cin, cout) + conv_gflops(h, w, cout, cout)
        bin_, bout = h_in * w_in * cin * bytes_f, h * w * cout * bytes_f
        passes = 8.0 if train_mode else 4.0
        gb = (bin_ + passes * bout) / 1e9
        if downsample:
            gf += conv_gflops(h, w, cin, cout, k=1)
            gb += (bin_ + 2 * bout) / 1e9
        return gf, gb

    roof = {}
    roof["stem_pool"] = (NF * (conv_gflops(44, 44, 4, 64, k=1) * 80),  # K=5*4*4*4=320 taps
                         NF * (88 * 88 * 1 * bytes_f
                               + (3.0 if train_mode else 1.0) * 44 * 44 * 64 * bytes_f
                               + 44 * 44 * 64 * bytes_f + 22 * 22 * 64 * bytes_f) / 1e9)
    g, b = block_cost(22, 22, 22, 22, 64, 64, False)
    roof["layer1"] = (NF * 2 * g, NF * 2 * b)
    g0, b0 = block_cost(22, 22, 11, 11, 64, 128, True)
    g1, b1 = block_cost(11, 11, 11, 11, 128, 128, False)
    roof["layer2"] = (NF * (g0 + g1), NF * (b0 + b1))
    g0, b0 = block_cost(11, 11, 6, 6, 128, 256, True)
    g1, b1 = block_cost(6, 6, 6, 6, 256, 256, False)
    roof["layer3"] = (NF * (g0 + g1), NF * (b0 + b1))
    g0, b0 = block_cost(6, 6, 3, 3, 256, 512, True)
    g1, b1 = block_cost(3, 3, 3, 3, 512, 512, False)
    roof["layer4"] = (NF * (g0 + g1), NF * (b0 + b1))

    results = {}
    total = 0.0
    for name, body in bodies.items():
        ms = timed(body, inputs[name])
        total += ms
        gf, gb = roof[name]
        floor_c = gf / (PEAK_TFLOPS * 1e3) * 1e3
        floor_m = gb / PEAK_GBS * 1e3
        results[name] = {
            "ms": round(ms, 2), "gflops": round(gf, 1),
            "hbm_gb": round(gb, 3),
            "floor_ms": round(max(floor_c, floor_m), 2),
            "bound": "compute" if floor_c >= floor_m else "memory",
            "x_floor": round(ms / max(floor_c, floor_m), 1),
        }
    print(json.dumps({"batch": B, "frames": frames, "train_mode": train_mode,
                      "bn_stats": os.environ.get("OMNI_BN_STATS", "onepass"),
                      "stages": results, "sum_ms": round(total, 2)},
                     indent=2), flush=True)

    # ---- whole-stage A/B: onepass vs twopass BN stats (train mode only)
    if train_mode:
        full = lambda v: resnet3d.resnet3d_forward(params, v, train_mode=True)
        for mode in ("onepass", "twopass"):
            os.environ["OMNI_BN_STATS"] = mode
            ms = timed(jax.jit(full), video)
            print(json.dumps({"full_resnet": mode, "ms": round(ms, 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
