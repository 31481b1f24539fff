"""One-command checkpoint-parity verification against BASELINE.md.

Given a trained reference checkpoint (`model_avg_4.pth`, the averaged
state_dict produced by `utils/avg_checkpoints.py:14-44` on lightning ckpts,
layout per `lightning_OmniAVSR.py:148-150`) and an LRS2/LRS3 test manifest,
this converts the checkpoint, runs the full task x rate WER grid with the
reference decode settings (beam 15, 32 tokens), and diffs every cell
against the published table transcribed in BASELINE.md. Exit code 0 iff
every setting is within `--tolerance` (default 0.1 abs WER, the BASELINE.md
target).

  python -m omni_avsr_tpu.cli.verify_parity \\
      --pretrained-model-path /ckpts/model_avg_4.pth \\
      --llm-model meta-llama/Llama-3.2-1B \\
      --root-dir /data/lrs3 --test-file /data/lrs3/test.csv \\
      --dataset lrs3 --output-json PARITY_RESULTS.json

`--convert-only` stops after conversion and prints a param-tree summary
(shape/dtype census vs the model's own init) — useful on machines that have
the checkpoint but not the corpus.

`--modes bf16,int8,bucket` runs the grid once per decode mode and emits a
side-by-side column per mode: `bf16` is reference-exact; `int8` adds
weight-only int8 LLM decode; `bucket` adds the bucketed Whisper window
(`--whisper-input-mode bucket`). This answers, in ONE run on a machine with
real checkpoints, whether each fast path is WER-neutral at full scale (the
tiny-scale evidence lives in tests/test_int8_wer.py and
tests/test_bucket_wer.py). Parity vs BASELINE.md is judged on the bf16
column; other columns are diffed against bf16.

`--golden-clip video_example.mp4` additionally preprocesses the reference's
bundled clip (RetinaFace/FAN when weights are available, deterministic
fallback otherwise) and records its beam-15 transcript per mode — the
SURVEY §4(d) golden-clip check (`preprocessing_inference_example/README.md:
40-66`). Audio is taken from a sibling .wav (or --golden-audio); without
one, the transcript is VSR-only.
"""

from __future__ import annotations

import argparse
import json
import sys

# LRS3 / LRS2 Omni-AVSR-ST WER (%) from BASELINE.md (paper main table,
# `/root/reference/assets/main_table.png` via README.md:74).
BASELINE_WER = {
    "lrs3": {
        ("audio", 4, None): 1.2, ("audio", 16, None): 2.0,
        ("video", None, 2): 26.8, ("video", None, 5): 27.1,
        ("audiovisual", 4, 2): 1.0, ("audiovisual", 4, 5): 1.1,
        ("audiovisual", 16, 2): 1.8, ("audiovisual", 16, 5): 1.9,
    },
    "lrs2": {
        ("audio", 4, None): 2.7, ("audio", 16, None): 4.8,
        ("video", None, 2): 27.8, ("video", None, 5): 29.5,
        ("audiovisual", 4, 2): 2.5, ("audiovisual", 4, 5): 2.7,
        ("audiovisual", 16, 2): 3.9, ("audiovisual", 16, 5): 4.2,
    },
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        "verify_parity", add_help=True,
        description="convert a reference checkpoint and diff WER vs BASELINE.md")
    p.add_argument("--dataset", default="lrs3", choices=["lrs3", "lrs2"])
    p.add_argument("--tolerance", type=float, default=0.1,
                   help="max |ours - reference| in absolute WER %% per setting")
    p.add_argument("--convert-only", action="store_true",
                   help="stop after checkpoint conversion; print a tree summary")
    p.add_argument("--output-json", default="PARITY_RESULTS.json")
    p.add_argument("--modes", default="bf16",
                   help="comma list of decode modes to grid: "
                        "bf16,int8,int4,bucket")
    p.add_argument("--golden-clip", default=None,
                   help="raw mp4 (e.g. video_example.mp4): preprocess + "
                        "transcribe per mode, recorded in the report")
    p.add_argument("--retinaface-weights", default=None,
                   help="Resnet50_Final.pth: golden-clip landmarks via the "
                        "JAX RetinaFace+FAN instead of the centered fallback")
    p.add_argument("--fan-weights", default=None)
    p.add_argument("--golden-audio", default=None,
                   help="16 kHz wav for the golden clip (default: sibling "
                        ".wav of --golden-clip if present)")
    p.add_argument("--profile", default="reference",
                   choices=["reference", "tpu", "none"],
                   help="numerics profile (utils/profiles.py). The default "
                        "pins EVERY runtime toggle to the reference-exact "
                        "combination (threefry/twopass/grid-select/xla-attn/"
                        "remat-off) so a parity run cannot silently inherit "
                        "a TPU fast path; 'tpu' keeps the tuned defaults")
    args, rest = p.parse_known_args(argv)
    if args.profile != "none":
        from ..utils.profiles import apply_profile

        apply_profile(args.profile)
    return args, rest


MODE_ARGV = {
    "bf16": [],
    "int8": ["--quantize-decode", "int8"],
    "int4": ["--quantize-decode", "int4"],  # packed runtime, opt-in
    "bucket": ["--whisper-input-mode", "bucket"],
}


def golden_transcripts(clip, audio_path, eval_argv, modes,
                       detector_weights=(None, None)):
    """Preprocess --golden-clip and beam-decode it under each mode."""
    import os

    import numpy as np

    from ..data.dataset import load_audio, load_video
    from ..preprocess.detector import build_detector
    from ..preprocess.mean_face import load_mean_face
    from ..preprocess.video_process import extract_mouth_rois
    from ..serve import Transcriber
    from . import eval_omni
    from .common import build_model, build_params

    frames = load_video(clip)
    det = build_detector("auto", retinaface_weights=detector_weights[0],
                         fan_weights=detector_weights[1])
    rois = extract_mouth_rois(frames, det(frames), load_mean_face())
    video = np.repeat(rois[..., None], 3, axis=-1)

    if audio_path is None:
        sib = clip[:-4] + ".wav"
        audio_path = sib if os.path.exists(sib) else None
    audio = load_audio(audio_path) if audio_path else None
    modality = "audiovisual" if audio is not None else "video"

    out = {}
    for mode in modes:
        ep = eval_omni.parse_args(eval_argv + MODE_ARGV[mode] +
                                  ["--print-hyp", "false"])
        model = build_model(ep)
        params = build_params(ep, model)
        t = Transcriber(model, params,
                        num_beams=model.cfg.num_beams,
                        max_new_tokens=model.cfg.max_dec_tokens,
                        quantize=mode if mode in ("int8", "int4") else None)
        out[mode] = t.transcribe(video=video, audio=audio, modality=modality)
        print(f"golden-clip [{mode}, {modality}]: {out[mode]!r}")
    return {"modality": modality, "transcripts": out}


def _tree_summary(params, init_params):
    """Census of the converted tree against the model's own init layout."""
    import jax

    flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    ref = dict(jax.tree_util.tree_flatten_with_path(init_params)[0])
    missing = sorted(set(map(str, ref)) - set(map(str, flat)))
    extra = sorted(set(map(str, flat)) - set(map(str, ref)))
    mismatched = []
    for k, v in flat.items():
        r = ref.get(k)
        if r is not None and tuple(v.shape) != tuple(r.shape):
            mismatched.append((str(k), tuple(v.shape), tuple(r.shape)))
    n_params = sum(int(v.size) for v in flat.values())
    return dict(
        leaves=len(flat), parameters=n_params,
        missing_vs_init=missing, extra_vs_init=extra,
        shape_mismatches=mismatched,
    )


def main(argv=None):
    args, eval_argv = parse_args(argv)

    from . import eval_omni

    if args.convert_only:
        import jax

        from .common import build_model, build_params

        ep = eval_omni.parse_args(eval_argv + ["--print-hyp", "false"])
        model = build_model(ep)
        params = build_params(ep, model)
        summary = _tree_summary(params, model.init_params(jax.random.PRNGKey(0)))
        ok = not (summary["missing_vs_init"] or summary["shape_mismatches"])
        print(json.dumps(summary, indent=2, default=str))
        print(f"conversion {'OK' if ok else 'MISMATCH'}: "
              f"{summary['parameters']:,} params in {summary['leaves']} leaves")
        return 0 if ok else 1

    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    unknown = [m for m in modes if m not in MODE_ARGV]
    assert not unknown, f"unknown modes {unknown}; pick from {list(MODE_ARGV)}"
    if "bf16" not in modes:
        modes.insert(0, "bf16")  # parity is always judged on bf16

    mode_results = {}
    for mode in modes:
        print(f"\n--- running decode grid: mode={mode} ---")
        mode_results[mode] = eval_omni.main(eval_argv + MODE_ARGV[mode])
    results = mode_results["bf16"]

    baseline = BASELINE_WER[args.dataset]
    rows, worst = [], 0.0
    for (task, ra, rv), ref_wer in baseline.items():
        key = f"{task} (a={ra}, v={rv})"
        ours = results.get(key)
        if ours is None:
            rows.append(dict(setting=key, reference=ref_wer, ours=None,
                             delta=None, status="MISSING"))
            worst = float("inf")
            continue
        ours_pct = 100.0 * ours
        delta = ours_pct - ref_wer
        worst = max(worst, abs(delta))
        row = dict(setting=key, reference=ref_wer,
                   ours=round(ours_pct, 2), delta=round(delta, 2),
                   status="PASS" if abs(delta) <= args.tolerance else "FAIL")
        # fast-path columns: diff vs OUR bf16 (is the fast path WER-neutral?)
        for mode in modes:
            if mode == "bf16":
                continue
            m = mode_results[mode].get(key)
            row[mode] = None if m is None else round(100.0 * m, 2)
            row[f"{mode}_vs_bf16"] = (None if m is None
                                      else round(100.0 * m - ours_pct, 2))
        rows.append(row)

    measured = [r for r in rows if r["ours"] is not None]
    avg_ours = sum(r["ours"] for r in measured) / max(1, len(measured))
    avg_ref = sum(r["reference"] for r in measured) / max(1, len(measured))

    extra_cols = [m for m in modes if m != "bf16"]
    hdr = "".join(f" {m:>7}" for m in extra_cols)
    print(f"\n=== parity vs BASELINE.md ({args.dataset}, tol {args.tolerance}) ===")
    print(f"{'setting':<34} {'ref':>6} {'bf16':>6} {'delta':>6}{hdr}  status")
    for r in rows:
        ours = f"{r['ours']:.2f}" if r["ours"] is not None else "--"
        delta = f"{r['delta']:+.2f}" if r["delta"] is not None else "--"
        extras = "".join(
            f" {r.get(m):>7.2f}" if r.get(m) is not None else f" {'--':>7}"
            for m in extra_cols)
        print(f"{r['setting']:<34} {r['reference']:>6.2f} {ours:>6} {delta:>6}"
              f"{extras}  {r['status']}")
    print(f"{'AVG over measured settings':<34} {avg_ref:>6.2f} {avg_ours:>6.2f} "
          f"{avg_ours - avg_ref:+6.2f}")

    report = dict(dataset=args.dataset, tolerance=args.tolerance, modes=modes,
                  rows=rows,
                  avg_reference=round(avg_ref, 3), avg_ours=round(avg_ours, 3),
                  worst_abs_delta=(None if worst == float("inf") else round(worst, 3)),
                  passed=all(r["status"] == "PASS" for r in rows))
    if args.golden_clip:
        report["golden_clip"] = golden_transcripts(
            args.golden_clip, args.golden_audio, eval_argv, modes,
            detector_weights=(args.retinaface_weights, args.fan_weights))
    with open(args.output_json, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.output_json}")
    return 0 if report["passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
