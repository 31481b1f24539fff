"""Golden-clip integration: the reference's bundled real video
(`preprocessing_inference_example/video_example.mp4`, 155 frames @ 224x224)
through the full preprocessing chain and the AVSR decode path
(SURVEY.md §4d). Random weights — checks mechanics/shapes, not WER."""

import os

import numpy as np
import pytest

import jax

CLIP = "/root/reference/preprocessing_inference_example/video_example.mp4"

pytestmark = pytest.mark.skipif(not os.path.exists(CLIP), reason="reference clip absent")


@pytest.fixture(scope="module")
def rois():
    from omni_avsr_tpu.data.dataset import load_video
    from omni_avsr_tpu.preprocess.detector import build_detector
    from omni_avsr_tpu.preprocess.mean_face import load_mean_face
    from omni_avsr_tpu.preprocess.video_process import extract_mouth_rois

    frames = load_video(CLIP)
    assert frames.shape == (155, 224, 224, 3)
    det = build_detector("auto")  # falls back to centered landmarks offline
    out = extract_mouth_rois(frames, det(frames), load_mean_face())
    return out


def test_mouth_roi_chain_on_real_clip(rois):
    # reference pipeline emits grayscale ROIs (convert_gray=True)
    assert rois.shape == (155, 96, 96)
    assert rois.dtype == np.uint8
    # crops are not constant (actual image content survived the warp)
    assert rois.std() > 5.0


@pytest.mark.slow
def test_vsr_decode_on_real_clip(rois):
    """ROI frames -> tiny random Omni model -> VSR beam decode end-to-end."""
    from omni_avsr_tpu.serve import Transcriber
    from tests.test_omni import tiny_omni

    model = tiny_omni()
    params = model.init_params(jax.random.PRNGKey(0))
    t = Transcriber(model, params, num_beams=2, max_new_tokens=4)
    video = np.repeat(rois[:64, ..., None], 3, axis=-1)
    text = t.transcribe(video=video, modality="video")
    assert isinstance(text, str)
