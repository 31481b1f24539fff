"""Host input-pipeline throughput vs the device train rate (VERDICT r3 #7).

The B12xF128 train step runs at ~172 ms (357 audio-s/s/chip,
docs/ROUND3_NOTES.md) — the host must decode + collate ~61 s of mp4+wav per
wall-second or the device starves. The reference hides this behind 5 torch
DataLoader workers (`datamodule/data_module.py:156`); our loader is
cv2 + stdlib-wave on a thread pool (`data/datamodule.py::_prefetch_iter`).

This writes an on-disk synthetic corpus at the training clip geometry and
measures FEED-ONLY throughput of the real train_batches iterator (decode,
augment-free collate, bucketing) at several worker counts.

The verdict is CORE-AWARE: the dev box exposes 1 CPU, so the per-core rate
is the portable number — `cores_needed = budget / best_rate_per_core` says
how many host cores the real TPU VM must devote to feeding (v5e hosts have
>100). Loader threads release the GIL inside cv2/np, so the per-core rate
scales close to linearly until storage saturates.

  python benchmarks/input_pipeline.py [n_clips] [frames] [budget_audio_s_per_s]

Prints one JSON line per worker count plus the verdict.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main():
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 357.0

    from omni_avsr_tpu.config import DataConfig
    from omni_avsr_tpu.data.datamodule import DataModule
    from omni_avsr_tpu.data.synthetic import generate_corpus
    from omni_avsr_tpu.data.tokenizer import synthetic_tokenizer

    root = tempfile.mkdtemp(prefix="input_pipe_")
    train_csv, val_csv, test_csv = generate_corpus(
        root, n_train=n_clips, n_val=1, n_test=1,
        min_frames=frames, max_frames=frames, min_words=6, max_words=10,
    )
    tok = synthetic_tokenizer("llama")

    n_cores = os.cpu_count() or 1
    results = {}
    worker_grid = sorted({1, 2, n_cores, 2 * n_cores})
    for workers in worker_grid:
        cfg = DataConfig(
            root_dir=root, train_file=train_csv, val_file=val_csv,
            test_file=test_csv, max_frames_audiovisual=12 * frames,
            train_num_buckets=4, num_workers=workers,
        )
        dm = DataModule(cfg, tok, modality="audiovisual")
        it = dm.train_batches(0)
        first = next(it)  # warmup: thread pool spin-up + first decode
        audio_s = float(first["audio_len"].sum()) / 16000.0
        t0 = time.perf_counter()
        n_batches = 1
        for batch in it:
            audio_s += float(batch["audio_len"].sum()) / 16000.0
            n_batches += 1
        dt = time.perf_counter() - t0
        rate = audio_s / dt
        results[workers] = rate
        print(json.dumps({
            "workers": workers, "batches": n_batches,
            "audio_s": round(audio_s, 1), "wall_s": round(dt, 2),
            "audio_s_per_s": round(rate, 1),
            "x_train_budget": round(rate / budget, 2),
        }), flush=True)

    best = max(results.values())
    cores_needed = budget / (best / n_cores)
    print(json.dumps({
        "verdict": ("feeds" if best >= budget
                    else f"needs ~{cores_needed:.0f} host cores"),
        "best_audio_s_per_s": round(best, 1),
        "per_core_audio_s_per_s": round(best / n_cores, 1),
        "host_cores": n_cores,
        "budget_audio_s_per_s": budget,
        "cores_needed_for_budget": round(cores_needed, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
