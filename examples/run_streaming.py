"""Streaming transcription example (parity: reference examples/run_streaming.py).

Reads the microphone (if sounddevice is installed) or a WAV file in 0.05 s
steps, feeds the streaming pipeline, and renders committed (green) /
assumption (yellow) words in place.

Usage:
    python examples/run_streaming.py --model /path/to/checkpoint --file a.wav \
        [--chunk-length 10] [--no-vad] [--cpu]
"""

import argparse

import os
import sys

# Allow running from a source checkout without installation.
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

GREEN = "\x1b[32m"
YELLOW = "\x1b[33m"
RESET = "\x1b[0m"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--file", default=None, help="WAV file (default: microphone)")
    ap.add_argument("--chunk-length", type=int, default=10,
                    choices=[10, 15, 20, 30])
    ap.add_argument("--language", default="en")
    ap.add_argument("--step", type=float, default=0.05)
    ap.add_argument("--no-vad", action="store_true")
    ap.add_argument("--no-realtime", action="store_true",
                    help="process the file as fast as possible")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from thewhisper_tpu.streaming import (
        FileStream,
        MicStream,
        StdoutStream,
        StreamingPipeline,
    )

    pipe = StreamingPipeline(
        model=args.model,
        chunk_length_s=args.chunk_length,
        language=args.language,
        use_vad=not args.no_vad,
    )
    if args.file:
        stream = FileStream(args.file, step_size_s=args.step,
                            real_time=not args.no_realtime)
    else:
        stream = MicStream(step_size_s=args.step)

    out = StdoutStream()
    try:
        while True:
            chunk = stream.next_chunk()
            if chunk is None:
                break
            committed, assumption = pipe(chunk)
            colored_committed = [
                {"text": GREEN + w["text"] + RESET} for w in committed]
            colored_assumption = [
                {"text": YELLOW + w["text"] + RESET} for w in assumption]
            out.write(colored_committed, colored_assumption)
    except KeyboardInterrupt:
        pass
    finally:
        out.close()
        stream.close()


if __name__ == "__main__":
    main()
