"""HTTP serving front end: dynamic batching groups concurrent requests
into one decode, batched results equal per-item transcribe, health/error
paths."""

import base64
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax

from omni_avsr_tpu.cli.serve_http import BatchingServer, serve
from omni_avsr_tpu.serve import Transcriber
from tests.test_omni import tiny_omni


@pytest.fixture(scope="module")
def transcriber():
    model = tiny_omni()
    params = model.init_params(jax.random.PRNGKey(0))
    return Transcriber(model, params, num_beams=2, max_new_tokens=4)


def test_transcribe_many_matches_single(transcriber):
    """Items in the SAME bucket class (the batcher's grouping key) decode
    identically batched or alone — composition-independence (ADVICE r3)."""
    from omni_avsr_tpu.serve import bucket_ladder

    rng = np.random.RandomState(0)
    items = [{"audio": (rng.randn(16000 + 1500 * i) * 0.1).astype(np.float32)}
             for i in range(3)]
    base = 640 * transcriber.video_pad_multiple
    classes = {bucket_ladder(len(it["audio"]), base) for it in items}
    assert len(classes) == 1  # same class -> exactness guaranteed for ALL
    batched = transcriber.transcribe_many(items, modality="audio")
    singles = [transcriber.transcribe(audio=it["audio"]) for it in items]
    assert len(batched) == 3
    assert batched == singles


def test_http_server_batches_concurrent_requests(transcriber):
    httpd, batcher = serve(transcriber, port=0, max_batch=4, max_wait_ms=200)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.RandomState(1)
        audio = (rng.randn(16000) * 0.1).astype(np.float32)
        payload = json.dumps({
            "audio_b64": base64.b64encode(audio.tobytes()).decode()
        }).encode()

        results = [None] * 3

        def post(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/transcribe", data=payload,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                results[i] = json.loads(r.read())

        threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert all(r is not None and "text" in r for r in results), results
        # all three arrived within the batching window -> one decode call
        assert max(r["batch_size"] for r in results) >= 2

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["requests"] == 3
        assert health["batches"] <= 2

        # error path: no media
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=b"{}",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        batcher.shutdown()


def test_batcher_separates_incompatible_groups(transcriber):
    b = BatchingServer(transcriber, max_batch=4, max_wait_ms=100)
    try:
        rng = np.random.RandomState(2)
        audio = (rng.randn(16000) * 0.1).astype(np.float32)
        p1 = b.submit({"audio": audio}, "audio", 1)
        p2 = b.submit({"audio": audio}, "audio", 2)  # different beams
        assert p1.event.wait(300) and p2.event.wait(300)
        assert p1.error is None and p2.error is None
        assert p1.batch_size == 1 and p2.batch_size == 1
        assert b.n_batches == 2
    finally:
        b.shutdown()


def test_transcribe_many_audiovisual(transcriber):
    rng = np.random.RandomState(3)
    items = [
        {"audio": (rng.randn(16000) * 0.1).astype(np.float32),
         "video": rng.randint(0, 255, (25, 96, 96, 3), dtype=np.uint8)},
        {"audio": (rng.randn(20000) * 0.1).astype(np.float32),
         "video": rng.randint(0, 255, (32, 96, 96, 3), dtype=np.uint8)},
    ]
    out = transcriber.transcribe_many(items)
    assert len(out) == 2 and all(isinstance(t, str) for t in out)


def test_batcher_groups_by_bucket_class(transcriber):
    """Requests in different padded-window classes decode in separate
    batches, so each sees its own class's window (composition-independent
    responses)."""
    b = BatchingServer(transcriber, max_batch=4, max_wait_ms=150)
    try:
        rng = np.random.RandomState(4)
        short = (rng.randn(12000) * 0.1).astype(np.float32)
        long = (rng.randn(60000) * 0.1).astype(np.float32)
        p1 = b.submit({"audio": short}, "audio", 2)
        p2 = b.submit({"audio": long}, "audio", 2)
        p3 = b.submit({"audio": short.copy()}, "audio", 2)
        assert all(p.event.wait(300) for p in (p1, p2, p3))
        assert all(p.error is None for p in (p1, p2, p3))
        assert p2.batch_size == 1  # its own class
        # the two short ones may or may not coalesce (queue order after the
        # incompatible long one), but they must never batch WITH the long one
        assert p1.batch_size <= 2 and p3.batch_size <= 2
        # each request alone gives the identical transcript
        assert p1.result == transcriber.transcribe(audio=short)
        assert p2.result == transcriber.transcribe(audio=long)
    finally:
        b.shutdown()


def test_http_rejects_modality_payload_mismatch(transcriber):
    """modality='audiovisual' with no video payload must be a 400 at the
    handler, not a 500 for the whole co-batch (ADVICE r3)."""
    httpd, batcher = serve(transcriber, port=0, max_batch=4, max_wait_ms=50)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.RandomState(5)
        audio = (rng.randn(16000) * 0.1).astype(np.float32)
        payload = json.dumps({
            "audio_b64": base64.b64encode(audio.tobytes()).decode(),
            "modality": "audiovisual",
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=payload,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
        assert "requires" in json.loads(ei.value.read())["error"]

        # unknown modality string is also a 400
        payload = json.dumps({
            "audio_b64": base64.b64encode(audio.tobytes()).decode(),
            "modality": "telepathy",
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=payload,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        batcher.shutdown()


def test_poison_request_does_not_fail_cobatch(transcriber):
    """A request that explodes inside decode errors ALONE; co-batched
    requests are retried individually and succeed (ADVICE r3)."""
    b = BatchingServer(transcriber, max_batch=4, max_wait_ms=200)
    try:
        rng = np.random.RandomState(6)
        good = (rng.randn(16000) * 0.1).astype(np.float32)
        poison = np.zeros((7, 2), np.float32)  # 2-D audio: dies in collate
        p_good = b.submit({"audio": good}, "audio", 2)
        p_bad = b.submit({"audio": poison}, "audio", 2)
        assert p_good.event.wait(300) and p_bad.event.wait(300)
        assert p_bad.error is not None
        assert p_good.error is None
        assert p_good.result == transcriber.transcribe(audio=good)
    finally:
        b.shutdown()
