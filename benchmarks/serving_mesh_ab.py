"""Mesh-of-1 serving A/B: Transcriber(mesh=...) vs Transcriber() on ONE chip.

VERDICT r4 item 3 asked for a TPU A/B showing mesh-sharded serving (which
since r5 keeps BOTH kernels: shard_mapped beam attention AND shard_mapped
fused selection) does not regress vs the unmeshed single-chip path. A
single-chip mesh (tp=1) exercises the serve.py mesh plumbing end to end —
decode_partition_specs + shard_params, the shard_map-wrapped beam-attention
kernel (1 shard), and the selection-mesh guard (tp<=1 falls back to the
local fused route by construction, `decode/decoding.py::beam_loop`) — so
any wrapper/layout overhead shows up here; the cross-shard merge math
itself is CPU-mesh token-exactness-tested (`tests/test_sharded_decode.py`).

  python benchmarks/serving_mesh_ab.py [batch] [frames] [iters]

Prints per-arm seconds/decode + audio-s/s and the A/B ratio as ONE JSON
line. Decode config = the WER-parity serving point: beam 15, 32 tokens,
int8 weights, bucketed whisper (`Omni_AVSR/modeling_OmniAVSR.py:312-322`).
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_arm(transcriber, items, iters):
    """Median wall seconds per transcribe_many call (values fetched — under
    the axon relay block_until_ready does not wait)."""
    out = transcriber.transcribe_many(items, modality="audiovisual")  # warmup/compile
    assert all(isinstance(t, str) for t in out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = transcriber.transcribe_many(items, modality="audiovisual")
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


def main():
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship
    from omni_avsr_tpu.config import MeshConfig
    from omni_avsr_tpu.parallel.mesh import make_mesh
    from omni_avsr_tpu.serve import Transcriber

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 160  # 6.4 s clips
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    model = _flagship(tiny=False)
    model = type(model)(
        dataclasses.replace(model.cfg, whisper_input_mode="bucket"), model.tok)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    items = [
        {
            "audio": rng.randn(frames * 640).astype(np.float32) * 0.05,
            "video": rng.randint(0, 255, (frames, 96, 96, 3)).astype(np.uint8),
        }
        for _ in range(B)
    ]
    audio_seconds = B * frames / 25.0

    results = {}
    hyps = {}
    for arm in ("nomesh", "mesh1"):
        mesh = (make_mesh(MeshConfig(dp=1, tp=1), devices=jax.devices()[:1])
                if arm == "mesh1" else None)
        t = Transcriber(model, params, num_beams=15, max_new_tokens=32,
                        quantize="int8", mesh=mesh)
        sec, out = _time_arm(t, items, iters)
        results[arm] = sec
        hyps[arm] = out
        print(f"{arm:>7}: {sec * 1e3:8.1f} ms/batch  "
              f"{audio_seconds / sec:7.1f} audio-s/s", flush=True)
        del t

    # mesh-of-1 must be token-identical: same weights, the attention kernel
    # shard_maps over one shard (same arithmetic) and selection falls back
    # to the identical local route (int8 fused-projection streams are
    # off-mesh-only, so tiny fp differences in layer outputs are possible —
    # compare transcripts, the serving contract)
    agree = float(np.mean([a == b for a, b in zip(hyps["nomesh"], hyps["mesh1"])]))
    ratio = results["mesh1"] / results["nomesh"]
    print(json.dumps({
        "metric": "serving_mesh1_overhead",
        "batch": B, "frames": frames, "beams": 15,
        "nomesh_s": round(results["nomesh"], 4),
        "mesh1_s": round(results["mesh1"], 4),
        "mesh1_over_nomesh": round(ratio, 4),
        "transcript_agreement": agree,
    }))


if __name__ == "__main__":
    main()
