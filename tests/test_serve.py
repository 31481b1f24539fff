"""Serving API: raw media in -> transcript out, all modalities, file path."""

import numpy as np
import pytest

import jax

from omni_avsr_tpu.serve import Transcriber
from tests.test_omni import tiny_omni


@pytest.fixture(scope="module")
def transcriber():
    model = tiny_omni()
    params = model.init_params(jax.random.PRNGKey(0))
    return Transcriber(model, params, num_beams=2, max_new_tokens=4)


def test_transcribe_modalities(transcriber):
    rng = np.random.RandomState(0)
    audio = (rng.randn(24000) * 0.1).astype(np.float32)
    video = rng.randint(0, 255, (40, 96, 96, 3), dtype=np.uint8)
    for kwargs in (
        {"audio": audio},
        {"video": video},
        {"audio": audio, "video": video},
    ):
        out = transcriber.transcribe(**kwargs)
        assert isinstance(out, str)


def test_transcribe_file(transcriber, tmp_path):
    from omni_avsr_tpu.data.synthetic import _write_video, _write_wav

    rng = np.random.RandomState(1)
    frames = rng.randint(0, 255, (30, 96, 96, 3), dtype=np.uint8)
    path = _write_video(str(tmp_path / "clip.mp4"), frames)
    _write_wav(str(tmp_path / "clip.wav"), (rng.randn(30 * 640) * 0.1).astype(np.float32))
    out = transcriber.transcribe_file(path, preprocessed=True)
    assert isinstance(out, str)
