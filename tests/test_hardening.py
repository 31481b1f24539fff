"""Failure-path hardening (VERDICT r1 weak #5/#7 + missing-noise notice):
over-long samples, orbax load without base towers, synthesized babble."""

import warnings

import numpy as np
import pytest

import jax

from tests.test_omni import tiny_omni


def test_bucket_batches_overlong_becomes_singleton():
    from omni_avsr_tpu.data.batching import bucket_batches

    lengths = [5, 30, 6, 4, 31]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # python fallback warns; native doesn't
        batches = bucket_batches(lengths, max_frames=10, num_buckets=2)
    flat = sorted(i for b in batches for i in b)
    assert flat == [0, 1, 2, 3, 4]  # nothing dropped, nothing duplicated
    for b in batches:
        if any(lengths[i] > 10 for i in b):
            assert len(b) == 1  # over-budget sample rides alone


def test_bucket_batches_python_fallback_warns(monkeypatch):
    import omni_avsr_tpu.utils.native as native
    from omni_avsr_tpu.data import batching

    def _boom(*a, **k):
        raise RuntimeError("no native lib")

    monkeypatch.setattr(native, "bucket_batches_native", _boom)
    with pytest.warns(UserWarning, match="exceed max_frames"):
        batching.bucket_batches([5, 30], max_frames=10, num_buckets=2)


def test_from_pretrained_orbax_requires_base_params(tmp_path):
    from omni_avsr_tpu.config import TrainConfig
    from omni_avsr_tpu.serve import Transcriber
    from omni_avsr_tpu.train.checkpoint import save_checkpoint
    from omni_avsr_tpu.train.engine import OmniEngine

    model = tiny_omni()
    params = model.init_params(jax.random.PRNGKey(0))
    engine = OmniEngine(model, params, TrainConfig(), 1.0, noise_bank=None,
                        inference_only=True)
    ckpt_dir = str(tmp_path / "ckpts")
    save_checkpoint(ckpt_dir, 1, {"step": 1, "trainable": engine.state.trainable})

    with pytest.raises(ValueError, match="base_params"):
        Transcriber.from_pretrained(ckpt_dir, tokenizer=model.tok, cfg=model.cfg)

    # explicit opt-ins still work
    t = Transcriber.from_pretrained(
        ckpt_dir, tokenizer=model.tok, cfg=model.cfg, base_params=params,
        num_beams=1, max_new_tokens=2,
    )
    assert t is not None
    t2 = Transcriber.from_pretrained(
        ckpt_dir, tokenizer=model.tok, cfg=model.cfg, allow_random_base=True,
        num_beams=1, max_new_tokens=2,
    )
    assert t2 is not None


def test_load_noise_bank_warns_when_synthesizing():
    from omni_avsr_tpu.data.noise import load_noise_bank

    with pytest.warns(UserWarning, match="SYNTHESIZED"):
        bank = load_noise_bank(None, seconds=1.0)
    assert bank.ndim == 1 and len(bank) == 16000
