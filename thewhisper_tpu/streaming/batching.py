"""Multi-stream batching executor: coalesce session buffers into one decode.

The reference server shares ONE pipeline across all sessions, so concurrent
streams interleave audio (``examples/server.py:26-28``, noted in SURVEY 2.4
as a limitation). The TPU build does what that design intended: per-session
``StreamingPipeline`` state machines, with their backend transcription
requests funneled through a ``BatchedTranscriber`` that packs concurrent
buffers into one bucketed engine call — batch is the native TPU axis.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Any, Dict, List, Optional

import numpy as np

from thewhisper_tpu.streaming.pipeline import (
    GIBBERISH_THRESHOLD,
    MAX_WORD_DURATION,
    TranscriptionBackend,
    Word,
    compression_ratio,
)


class BatchedTranscriber:
    """Background worker that batches transcription requests.

    Requests arriving within ``max_wait_ms`` of each other (up to
    ``max_batch``) are decoded in a single ``ASRPipeline.transcribe_batch``
    call. Each session gets a :class:`QueuedBackend` handle.
    """

    def __init__(
        self,
        asr_pipeline,
        language: str = "en",
        max_new_tokens: int = 128,
        max_batch: int = 8,
        max_wait_ms: float = 10.0,
    ):
        self.pipeline = asr_pipeline
        self.language = language
        self.max_new_tokens = max_new_tokens
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, audio: np.ndarray) -> Future:
        fut: Future = Future()
        self._q.put((audio, fut))
        return fut

    def close(self) -> None:
        self._stop.set()
        self._q.put(None)
        self._thread.join(timeout=2.0)

    def _worker(self) -> None:
        while not self._stop.is_set():
            item = self._q.get()
            if item is None:
                break
            batch = [item]
            # Coalesce whatever arrives within the wait window.
            deadline = self.max_wait_s
            while len(batch) < self.max_batch:
                try:
                    nxt = self._q.get(timeout=deadline)
                except queue.Empty:
                    break
                if nxt is None:
                    self._stop.set()
                    break
                batch.append(nxt)
            audios = [a for a, _ in batch]
            futures = [f for _, f in batch]
            try:
                results = self.pipeline.transcribe_batch(
                    audios,
                    return_timestamps="word",
                    generate_kwargs={
                        "language": self.language,
                        "max_new_tokens": self.max_new_tokens,
                        "num_beams": 1,
                    },
                )
            except Exception as e:  # propagate to all waiters
                for f in futures:
                    f.set_exception(e)
                continue
            for f, r in zip(futures, results):
                f.set_result(r)

    def backend(self) -> "QueuedBackend":
        return QueuedBackend(self)


class QueuedBackend(TranscriptionBackend):
    """Session-facing backend that rides the shared batch queue.

    Applies the same gibberish filter and open-end clamp as
    ``LocalWhisperBackend`` (reference ``streaming_pipeline.py:412-426``).
    """

    def __init__(self, transcriber: BatchedTranscriber):
        self.transcriber = transcriber

    def transcribe(self, audio: np.ndarray, buffer_start_time: float,
                   sample_rate: int) -> List[Word]:
        result: Dict[str, Any] = self.transcriber.submit(audio).result()
        if compression_ratio(result["text"]) > GIBBERISH_THRESHOLD:
            return []
        audio_duration = len(audio) / sample_rate
        words: List[Word] = []
        for token in result.get("chunks", []):
            start, end = token["timestamp"]
            if end is None:
                if audio_duration - start < MAX_WORD_DURATION:
                    end = audio_duration
                else:
                    end = start + MAX_WORD_DURATION
            words.append({
                "text": token["text"],
                "start": start + buffer_start_time,
                "end": end + buffer_start_time,
            })
        return words
