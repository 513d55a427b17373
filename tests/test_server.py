"""REST server tests: full HTTP round trip with a fake backend."""

import base64
import threading

import numpy as np
import pytest

from thewhisper_tpu.config import ServerConfig
from thewhisper_tpu.server import SessionManager, StreamingServer
from thewhisper_tpu.streaming import TranscriptionBackend


class FakeBackend(TranscriptionBackend):
    def transcribe(self, audio, buffer_start_time, sample_rate):
        n = int(len(audio) / sample_rate / 0.5)
        return [
            {"text": f" w{i}", "start": buffer_start_time + 0.5 * i,
             "end": buffer_start_time + 0.5 * (i + 1)}
            for i in range(n)
        ]


@pytest.fixture()
def server():
    manager = SessionManager(lambda: FakeBackend(), chunk_length_s=4,
                             use_vad=False)
    srv = StreamingServer(
        manager, ServerConfig(host="127.0.0.1", port=0))
    srv.start_background()
    yield srv
    srv.shutdown()


def _b64(audio: np.ndarray) -> str:
    return base64.b64encode(audio.astype(np.float32).tobytes()).decode()


def test_session_lifecycle_and_streaming(server):
    import httpx

    base = f"http://127.0.0.1:{server.port}"
    sid = httpx.post(f"{base}/session/create/").json()["session_id"]
    assert sid

    rng = np.random.default_rng(0)
    # Push 3.2 s of audio in 0.1 s chunks; poll /process like the Electron app.
    got_words = False
    for i in range(32):
        chunk = (0.1 * rng.standard_normal(1600)).astype(np.float32)
        r = httpx.post(
            f"{base}/session/{sid}/add_chunk", params={"audio_data": _b64(chunk)})
        assert r.status_code == 200, r.text
        r = httpx.post(f"{base}/session/{sid}/process")
        assert r.status_code == 200
        payload = r.json()
        assert set(payload) == {"words", "uncommited_words"}
        if payload["words"] or payload["uncommited_words"]:
            got_words = True
    assert got_words

    assert httpx.post(f"{base}/session/{sid}/clear").status_code == 200
    assert httpx.post(f"{base}/session/{sid}/end").status_code == 200
    # After end, the session is gone.
    assert httpx.post(f"{base}/session/{sid}/process").status_code == 404


def test_sessions_are_isolated(server):
    import httpx

    base = f"http://127.0.0.1:{server.port}"
    sid1 = httpx.post(f"{base}/session/create/").json()["session_id"]
    sid2 = httpx.post(f"{base}/session/create/").json()["session_id"]
    assert sid1 != sid2

    rng = np.random.default_rng(1)
    # Feed only session 1.
    for _ in range(30):
        chunk = (0.1 * rng.standard_normal(1600)).astype(np.float32)
        httpx.post(f"{base}/session/{sid1}/add_chunk",
                   params={"audio_data": _b64(chunk)})
        httpx.post(f"{base}/session/{sid1}/process")
    # Session 2 has seen no audio: no words.
    r = httpx.post(f"{base}/session/{sid2}/process").json()
    assert r["words"] == [] and r["uncommited_words"] == []


def test_keep_alive_with_unread_bodies(server):
    """HTTP/1.1 keep-alive: bodies on routes that ignore them must be
    drained, or the leftover bytes desync the next request on the same
    connection (round-2 review finding)."""
    import http.client
    import json as _json

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    try:
        def post(path, body=b"{}"):
            conn.request("POST", path, body=body,
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            data = r.read()
            assert r.status == 200, (path, r.status, data)
            return _json.loads(data)

        sid = post("/session/create/")["session_id"]
        payload = _json.dumps(
            {"audio_data": _b64(np.zeros(1600, np.float32))}).encode()
        for _ in range(3):
            post(f"/session/{sid}/add_chunk", body=payload)
        r = post(f"/session/{sid}/process", body=b'{"ignored": 1}')
        assert "words" in r and "uncommited_words" in r
        post(f"/session/{sid}/end")
    finally:
        conn.close()


def test_bad_requests(server):
    import httpx

    base = f"http://127.0.0.1:{server.port}"
    assert httpx.post(f"{base}/session/nope/process").status_code == 404
    sid = httpx.post(f"{base}/session/create/").json()["session_id"]
    r = httpx.post(f"{base}/session/{sid}/add_chunk")  # missing audio_data
    assert r.status_code == 500
    assert "audio_data" in r.json()["detail"]
    assert httpx.get(f"{base}/health").status_code == 200


def test_batched_transcriber_coalesces():
    from thewhisper_tpu.streaming.batching import BatchedTranscriber

    calls = []

    class FakePipe:
        def transcribe_batch(self, audios, **kw):
            calls.append(len(audios))
            return [
                {"text": " ok", "chunks": [
                    {"text": " ok", "timestamp": (0.0, None)}]}
                for _ in audios
            ]

    bt = BatchedTranscriber(FakePipe(), max_batch=8, max_wait_ms=50)
    backends = [bt.backend() for _ in range(4)]
    results = []
    threads = [
        threading.Thread(
            target=lambda b=b: results.append(
                b.transcribe(np.zeros(16000, np.float32), 10.0, 16000)))
        for b in backends
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    bt.close()
    assert len(results) == 4
    # The 4 concurrent requests rode <= 2 engine calls (usually 1).
    assert sum(calls) == 4 and len(calls) <= 2
    # Open word end clamped using MAX_WORD_DURATION against 1 s audio.
    w = results[0][0]
    assert w["start"] == 10.0 and w["end"] == 11.0


def test_session_bounds_and_eviction():
    """Abandoned sessions expire (TTL) and the table is LRU-bounded."""
    manager = SessionManager(lambda: FakeBackend(), chunk_length_s=4,
                             use_vad=False, max_sessions=3,
                             session_ttl_s=1000.0)
    sids = [manager.create() for _ in range(3)]
    assert manager.n_sessions == 3
    # Touch the newer two; creating a 4th evicts the least-recently-used.
    manager.process(sids[1])
    manager.process(sids[2])
    s4 = manager.create()
    assert manager.n_sessions <= 3
    import pytest as _pytest

    from thewhisper_tpu.server.http import SessionNotFound

    with _pytest.raises(SessionNotFound):
        manager.process(sids[0])
    manager.process(s4)                       # survivor works
    # TTL expiry: backdate every session, next create sweeps them.
    manager.session_ttl_s = 0.0
    manager._last_seen = {k: -1e9 for k in manager._last_seen}
    manager.create()
    assert manager.n_sessions == 1


def test_malformed_base64_fails_loudly(server):
    import httpx

    base = f"http://127.0.0.1:{server.port}"
    sid = httpx.post(f"{base}/session/create/").json()["session_id"]
    # '%' is not in the base64 alphabet: must be a 500, not silently
    # bit-shifted into garbage audio with status "success".
    r = httpx.post(f"{base}/session/{sid}/add_chunk",
                   params={"audio_data": "ab%cd=="})
    assert r.status_code == 500


def test_stats_endpoint(server):
    import httpx

    base = f"http://127.0.0.1:{server.port}"
    sid = httpx.post(f"{base}/session/create/").json()["session_id"]
    rng = np.random.default_rng(3)
    for _ in range(25):
        chunk = (0.1 * rng.standard_normal(1600)).astype(np.float32)
        httpx.post(f"{base}/session/{sid}/add_chunk",
                   params={"audio_data": _b64(chunk)})
        httpx.post(f"{base}/session/{sid}/process")
    stats = httpx.get(f"{base}/stats").json()
    assert stats["sessions"] >= 1
    assert stats["totals"]["chunks_processed"] >= 1
    assert sid in stats["per_session"]


def test_concurrent_sessions_with_real_model(tmp_path_factory):
    """BASELINE config #5: N concurrent streams, batched decode, real model."""
    import sys
    import httpx

    sys.path.insert(0, "tools")
    from make_tiny_checkpoint import make_checkpoint

    import jax.numpy as jnp

    from thewhisper_tpu.pipeline import ASRPipeline
    from thewhisper_tpu.streaming.batching import BatchedTranscriber

    ckpt = tmp_path_factory.mktemp("srv_ckpt") / "tiny"
    make_checkpoint(str(ckpt), seed=0)
    asr = ASRPipeline(str(ckpt), chunk_length_s=10, compute_dtype=jnp.float32)
    transcriber = BatchedTranscriber(asr, max_batch=4, max_wait_ms=20)
    manager = SessionManager(lambda: transcriber.backend(),
                             chunk_length_s=10, use_vad=False)
    srv = StreamingServer(manager, ServerConfig(host="127.0.0.1", port=0))
    srv.start_background()
    base = f"http://127.0.0.1:{srv.port}"

    def drive(seed):
        sid = httpx.post(f"{base}/session/create/").json()["session_id"]
        rng = np.random.default_rng(seed)
        events = 0
        for _ in range(30):  # 3 s at 0.1 s chunks
            chunk = (0.2 * rng.standard_normal(1600)).astype(np.float32)
            r = httpx.post(f"{base}/session/{sid}/add_chunk",
                           params={"audio_data": _b64(chunk)}, timeout=120)
            assert r.status_code == 200
            r = httpx.post(f"{base}/session/{sid}/process", timeout=300)
            assert r.status_code == 200
            payload = r.json()
            events += len(payload["words"]) + len(payload["uncommited_words"])
        httpx.post(f"{base}/session/{sid}/end")
        return events

    try:
        results = []
        errors = []

        def worker(seed):
            try:
                results.append(drive(seed))
            except Exception as e:  # surface thread failures to the test
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(s,))
                   for s in (1, 2, 3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        assert len(results) == 3
    finally:
        srv.shutdown()
        transcriber.close()


def test_eviction_skips_active_sessions():
    """LRU eviction must not drop a session a request thread is inside
    (its lock held); with every session active, create() -> ServerFull
    (mapped to 503) instead of 404ing a live stream (round-2 advisory)."""
    from thewhisper_tpu.server.http import ServerFull

    manager = SessionManager(lambda: FakeBackend(), chunk_length_s=4,
                             use_vad=False, max_sessions=2,
                             session_ttl_s=1000.0)
    s1 = manager.create()
    s2 = manager.create()
    # s1 is LRU but "active": hold its per-session lock like a request
    # thread mid-process would.
    lock1 = manager._locks[s1]
    lock1.acquire()
    try:
        s3 = manager.create()       # must evict s2, NOT the active s1
        assert s1 in manager._sessions
        assert s2 not in manager._sessions
        # All remaining sessions active -> capacity error, no eviction.
        manager._locks[s3].acquire()
        try:
            with pytest.raises(ServerFull):
                manager.create()
            assert s1 in manager._sessions and s3 in manager._sessions
        finally:
            manager._locks[s3].release()
    finally:
        lock1.release()
    # With s1 idle again, creation succeeds by evicting LRU.
    manager.create()
    assert manager.n_sessions == 2


def test_per_session_language_coalesced():
    """Sessions created with different languages coalesce into one batch
    with per-row prompts (the desktop client's language dropdown)."""
    from thewhisper_tpu.streaming.batching import BatchedTranscriber

    calls = {}

    class FakePipeline:
        def transcribe_batch(self, audios, return_timestamps="word",
                             generate_kwargs=None, languages=None):
            calls["languages"] = languages
            return [{"text": f" w{i}", "chunks": [
                {"text": f" w{i}", "timestamp": (0.0, 0.5)}]}
                for i in range(len(audios))]

    bt = BatchedTranscriber(FakePipeline(), language="en", max_batch=4,
                            max_wait_ms=100.0)
    try:
        a = np.zeros(8000, np.float32)
        f1 = bt.submit(a, language="fr")
        f2 = bt.submit(a, language="de")
        f3 = bt.submit(a)                       # default
        assert f1.result(timeout=10)["text"] == " w0"
        assert f2.result(timeout=10)["text"] == " w1"
        assert f3.result(timeout=10)["text"] == " w2"
        assert calls["languages"] == ["fr", "de", None]
    finally:
        bt.close()


def test_create_with_language_and_health_backend(server):
    import httpx

    base = f"http://127.0.0.1:{server.port}"
    h = httpx.get(f"{base}/health").json()
    assert h["backend"] == "tpu"                # SessionManager default
    r = httpx.post(f"{base}/session/create/", params={"language": "fr"})
    sid = r.json()["session_id"]
    # FakeBackend has no language attr -> create still succeeds.
    assert httpx.post(f"{base}/session/{sid}/end").status_code == 200


def test_create_rejects_unknown_language(server):
    """An invalid language code 400s at create — it must never reach the
    coalesced batch decode, where the prompt-build error would fail
    every concurrent session's request in that batch."""
    import httpx

    base = f"http://127.0.0.1:{server.port}"
    r = httpx.post(f"{base}/session/create/", params={"language": "xx"})
    assert r.status_code == 400
    assert "language" in r.json()["detail"]
    # Valid codes still create.
    assert "session_id" in httpx.post(
        f"{base}/session/create/", params={"language": "de"}).json()


def test_acquire_survives_end_while_queued():
    """A request queued behind a held session lock gets a clean 404 when
    the session is ended mid-wait (not an orphaned-pipeline write)."""
    import threading
    import time as _time

    from thewhisper_tpu.server.http import SessionManager, SessionNotFound

    manager = SessionManager(lambda: FakeBackend(), chunk_length_s=4,
                             use_vad=False)
    sid = manager.create()
    pipe, lock = manager._acquire(sid)          # hold like a live request
    errs = []

    def late_request():
        try:
            manager.add_chunk(sid, np.zeros(100, np.float32))
        except SessionNotFound:
            errs.append("not_found")

    t = threading.Thread(target=late_request)
    t.start()
    _time.sleep(0.1)                            # let it block on the lock
    manager.end(sid)
    lock.release()
    t.join(timeout=5)
    assert errs == ["not_found"]
