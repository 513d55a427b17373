"""RemoteAPITimestampsBackend against a fake Triton-style gateway."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from thewhisper_tpu.streaming.pipeline import (
    RemoteAPIBackend,
    RemoteAPITimestampsBackend,
)


class FakeTriton(BaseHTTPRequestHandler):
    # Class-level knobs set by the fixture.
    response_payload = {}
    seen = []

    def log_message(self, *a):
        pass

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        FakeTriton.seen.append({
            "headers": dict(self.headers),
            "has_wav": b"RIFF" in body,
        })
        out = json.dumps(FakeTriton.response_payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)


@pytest.fixture()
def triton():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), FakeTriton)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    FakeTriton.seen = []
    yield f"http://127.0.0.1:{srv.server_address[1]}/infer"
    srv.shutdown()
    srv.server_close()


AUDIO = (0.1 * np.random.default_rng(0).standard_normal(32000)).astype(np.float32)


def test_remote_backend_parses_dict_metadata(triton):
    FakeTriton.response_payload = {
        "transcription": "hello world",
        "metadata": {"chunks": [
            {"text": " hello", "timestamp": [0.0, 0.5]},
            {"text": " world", "timestamp": [0.5, None]},
        ]},
    }
    be = RemoteAPITimestampsBackend(api_url=triton, auth_token="tok",
                                    model_name="m", lang_id="en")
    words = be.transcribe(AUDIO, buffer_start_time=10.0, sample_rate=16000)
    assert [w["text"] for w in words] == [" hello", " world"]
    assert words[0]["start"] == 10.0 and words[0]["end"] == 10.5
    # Open end clamped to min(start + 1.0, duration); duration 2.0 - 0.5 >= 1.
    assert words[1]["end"] == pytest.approx(10.5 + 1.0)
    # Headers + WAV body reached the gateway.
    h = FakeTriton.seen[0]["headers"]
    assert h["Authorization"] == "Bearer tok"
    assert h["X-Model-Name"] == "m" and h["X-Lang-Id"] == "en"
    assert FakeTriton.seen[0]["has_wav"]


def test_remote_backend_metadata_as_json_string(triton):
    FakeTriton.response_payload = {
        "metadata": json.dumps({"chunks": [
            {"text": " a", "timestamps": [0.0, 0.3]},
        ]}),
    }
    be = RemoteAPITimestampsBackend(api_url=triton)
    words = be.transcribe(AUDIO, 0.0, 16000)
    assert len(words) == 1 and words[0]["end"] == pytest.approx(0.3)


def test_remote_backend_metadata_as_list(triton):
    FakeTriton.response_payload = {
        "metadata": [{"noise": 1}, {"chunks": [
            {"text": " b", "time": [1.0, 1.2]},
        ]}],
    }
    be = RemoteAPITimestampsBackend(api_url=triton)
    words = be.transcribe(AUDIO, 0.0, 16000)
    assert [w["text"] for w in words] == [" b"]


def test_remote_backend_no_chunks_returns_empty(triton):
    FakeTriton.response_payload = {"transcription": "x", "metadata": {}}
    be = RemoteAPITimestampsBackend(api_url=triton)
    assert be.transcribe(AUDIO, 0.0, 16000) == []


def test_remote_backend_gibberish_filtered(triton):
    FakeTriton.response_payload = {
        "metadata": {"chunks": [
            {"text": " the", "timestamp": [0.1 * i, 0.1 * i + 0.1]}
            for i in range(40)
        ]},
    }
    be = RemoteAPITimestampsBackend(api_url=triton)
    assert be.transcribe(AUDIO, 0.0, 16000) == []


def test_remote_backend_from_env(monkeypatch, triton):
    monkeypatch.setenv("TRITON_URL", triton)
    monkeypatch.setenv("TRITON_AUTH_TOKEN", "envtok")
    monkeypatch.setenv("TRITON_MODEL_NAME", "envmodel")
    be = RemoteAPITimestampsBackend.from_env()
    assert be.api_url == triton and be.auth_token == "envtok"

    monkeypatch.delenv("TRITON_URL")
    with pytest.raises(ValueError):
        RemoteAPIBackend.from_env()


def test_base_remote_backend_requires_timestamps_subclass():
    be = RemoteAPIBackend(api_url="http://x")
    with pytest.raises(NotImplementedError):
        be.transcribe(AUDIO, 0.0, 16000)
