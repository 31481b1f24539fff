"""Scaled WER-neutrality gate for the bench decode defaults (VERDICT r3 #4).

Runs the same harness as `benchmarks/wer_probe.py` — a tiny Omni model
TRAINED TO FIT its synthetic corpus (the memorized, contentful-token
regime where quantization noise can actually flip tokens), decoded at the
reference's beam-15 configuration (`Omni_AVSR/modeling_OmniAVSR.py:312-322`)
— and asserts the two bench defaults (int8 weights, bucketed Whisper) are
WER-neutral with high transcript agreement. int4-RTN rows are recorded by
the benchmark, not gated here (int4 is an opt-in runtime, PARITY.md).

CI-sized: fewer clips/settings than the ledger run (32 clips, full grid,
docs/wer_probe_r4.json) but the same code path and decode settings.
"""

import sys

import pytest


@pytest.mark.slow
def test_bench_default_modes_wer_neutral_at_beam15():
    sys.path.insert(0, "benchmarks")
    from wer_probe import run_probe

    res = run_probe(
        n_clips=10, n_test=4, epochs=300, num_beams=15, max_new=16,
        llm_layers=2, batch_size=5, seed=0, target_loss=0.4,
        tasks=("audiovisual",), splits=("trainmem",), max_settings=2,
        verbose=False,
    )
    grid = res["grid"]
    assert grid, "empty probe grid"
    fitted = res["settings"].get("final_loss")
    for key, cell in grid.items():
        bf16 = cell["bf16"]
        # the probe is only meaningful fitted: memorized-split bf16 WER
        # must be far below the garbage regime (~4.0 insertions-dominated)
        assert bf16["wer"] < 0.6, (key, bf16["wer"], fitted)
        for mode in ("int8", "bucket"):
            m = cell[mode]
            assert m["wer"] <= bf16["wer"] + 0.10, (key, mode, m, bf16)
            assert m["agree"] >= 0.5, (key, mode, m["agree"])
