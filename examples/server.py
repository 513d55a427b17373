"""REST streaming server (parity: reference examples/server.py).

Environment (same variables as the reference):
    ASR_STREAMING_HOST (default 127.0.0.1), ASR_STREAMING_PORT (default 8800)
    CHUNK_SECONDS (default 10)
    ASR_BACKEND_TYPE: "tpu" (local, default) or "whisper" (remote Triton)
    TRITON_URL / TRITON_AUTH_TOKEN / TRITON_MODEL_NAME / TRITON_LANG_ID
    ASR_MODEL: HF checkpoint directory for the local backend

Extensions (this framework only):
    ASR_MODEL_SIZE ("S"/"S+"/"XL"), ASR_DRAFT, ASR_REUSE_PREV=1,
    ASR_WARMUP=0, ASR_LATENCY_BUCKETS="2.5,5" (sub-chunk encoder
    buckets for early-stream ticks)

Unlike the reference (one shared pipeline for all sessions,
``server.py:26-28``), every session has its own state machine; decode
requests from all sessions are batched into single TPU calls.
"""

import os
import sys

# Allow running from a source checkout without installation.
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)


def main():
    from thewhisper_tpu.config import ServerConfig
    from thewhisper_tpu.server import SessionManager, StreamingServer

    config = ServerConfig.from_env()
    backend_type = os.getenv("ASR_BACKEND_TYPE", "tpu").lower()

    if backend_type == "whisper":
        from thewhisper_tpu.streaming.pipeline import RemoteAPITimestampsBackend

        def backend_factory():
            return RemoteAPITimestampsBackend.from_env()

        print("Streaming backend: remote Whisper/Triton API")
    else:
        from thewhisper_tpu.pipeline import ASRPipeline
        from thewhisper_tpu.streaming.batching import BatchedTranscriber

        model = os.getenv("ASR_MODEL")
        if not model:
            raise SystemExit("set ASR_MODEL to an HF checkpoint directory")
        # ASR_DRAFT: "ngram" | "layer-skip:N" | a draft .npz/checkpoint —
        # speculative decoding (exact greedy output, engine/speculative.py).
        # ASR_REUSE_PREV=1: cross-tick proposal drafting (the previous
        # tick's tokens speculate each re-decode; rows associate by batch
        # position, which only ever affects speed, never content).
        # ASR_LATENCY_BUCKETS="2.5,5": opt-in sub-chunk encoder buckets —
        # a short early-stream buffer encodes at the smallest fitting
        # bucket (2.5 s encode+crossKV is ~2.2 ms vs 7.7 ms for the full
        # 10 s bucket, tools/ttft_probe.py), cutting first-tick latency.
        # Off by default: exact reference behavior, and flexible-chunk
        # position truncation should be validated on real weights first.
        raw = os.getenv("ASR_LATENCY_BUCKETS", "")
        try:
            buckets = [float(b) for b in raw.split(",") if b.strip()]
        except ValueError:
            raise SystemExit(
                f"ASR_LATENCY_BUCKETS must be comma-separated seconds "
                f"(e.g. \"2.5,5\"), got: {raw!r}")
        asr = ASRPipeline(
            model, chunk_length_s=config.chunk_length_s,
            model_size=os.getenv("ASR_MODEL_SIZE") or None,
            draft=os.getenv("ASR_DRAFT") or None,
            latency_buckets=buckets or None,
            # Cross-tick proposal reuse defaults ON (59.4 -> 52.8 ms
            # p50 single-session; in coalesced multi-session batches a
            # membership change misaligns rows for one tick, which only
            # costs verify misses at ~step price — output unchanged).
            # ASR_REUSE_PREV=0 forces the plain path.
            reuse_previous_tokens=os.getenv("ASR_REUSE_PREV", "1") == "1")

        if os.getenv("ASR_WARMUP", "1") != "0":
            import numpy as np

            print("Warming up (compiling the decode executables)...")
            gk = {"max_new_tokens": 128, "language": "en"}
            one = np.zeros(int((config.chunk_length_s - 1) * 16000),
                           np.float32)
            # Warm every batch bucket the coalescer can produce (up to
            # BatchedTranscriber's max_batch=8): the first multi-session
            # tick would otherwise pay a minutes-long cold compile while
            # holding session locks.
            # Each configured latency bucket is its own T_mel, hence its
            # own executable per batch bucket — warm them all, or the
            # first short-buffer live tick pays the cold compile this
            # warmup exists to prevent.
            sizes = [one] + [
                np.zeros(int(b * 16000) - 1600, np.float32)
                for b in asr.latency_buckets
                if b < asr.model_chunk_length_s]
            for nb in (1, 2, 4, 8):
                for buf in sizes:
                    asr.transcribe_batch([buf] * nb, return_timestamps="word",
                                         generate_kwargs=gk)
                if asr._reuse_previous:
                    # Immediately repeat at the SAME size: the first call
                    # seeded _prev_gen_tokens for this batch shape, the
                    # second compiles the proposals=True executable so the
                    # first LIVE tick doesn't compile mid-request.
                    asr.transcribe_batch([one] * nb, return_timestamps="word",
                                         generate_kwargs=gk)
            print("Warmup done")

        transcriber = BatchedTranscriber(asr)

        def backend_factory():
            return transcriber.backend()

        print("Streaming backend: local TPU engine (batched)")

    manager = SessionManager(backend_factory,
                             chunk_length_s=config.chunk_length_s,
                             backend_type=backend_type)
    server = StreamingServer(manager, config)
    print(f"Server started on {config.host}:{server.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
