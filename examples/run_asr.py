"""Offline transcription example (parity: reference examples/run_*_asr.py).

Usage:
    python examples/run_asr.py AUDIO.wav --model /path/to/hf/checkpoint \
        --chunk-length 30 [--language en] [--cpu]

Like the reference examples, the call-time window is ``chunk_length - 1``
seconds with overlap (``run_apple_asr.py:41``).
"""

import argparse
import json
import time

import os
import sys

# Allow running from a source checkout without installation.
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("audio")
    ap.add_argument("--model", required=True, help="HF checkpoint directory")
    ap.add_argument("--model-size", default=None, help='"S" (int8) or "XL" (bf16)')
    ap.add_argument("--chunk-length", type=int, default=30,
                    choices=[10, 15, 20, 30])
    ap.add_argument("--language", default="en")
    ap.add_argument("--max-new-tokens", type=int, default=224)
    ap.add_argument("--cpu", action="store_true", help="force CPU JAX")
    ap.add_argument("--srt", default=None, metavar="PATH",
                    help="also write subtitles (.srt or .vtt by extension)")
    ap.add_argument("--draft", default=None,
                    help='speculative decoding: "ngram", "layer-skip:N", '
                         "or a draft checkpoint/.npz (greedy-exact)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from thewhisper_tpu.pipeline import ASRPipeline

    pipeline = ASRPipeline(
        args.model,
        model_size=args.model_size,
        chunk_length_s=args.chunk_length,
        language=args.language,
        draft=args.draft,
    )

    t0 = time.perf_counter()
    result = pipeline(
        args.audio,
        return_timestamps="word",
        generate_kwargs={
            "num_beams": 1,
            "language": args.language,
            "max_new_tokens": args.max_new_tokens,
        },
        chunk_length_s=args.chunk_length - 1,
    )
    dt = time.perf_counter() - t0

    print(result["text"])
    print()
    print(json.dumps(result["chunks"], indent=2, default=str))
    if args.srt:
        from thewhisper_tpu.utils.subtitles import write_subtitles

        write_subtitles(args.srt, result.get("chunks", []))
        print(f"\n[subtitles written to {args.srt}]")
    print(f"\n[transcribed in {dt:.2f}s]")


if __name__ == "__main__":
    main()
