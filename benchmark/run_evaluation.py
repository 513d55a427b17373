"""OpenASR evaluation entry point (reference ``benchmark/run_evaluation.py``).

Usage (HF datasets, needs network/cache):
    python benchmark/run_evaluation.py --model /ckpt --tasks open_asr_en \
        --batch-size 32 --chunk-length 30 --max-samples 200

Offline / air-gapped (local jsonl manifest):
    python benchmark/run_evaluation.py --model /ckpt \
        --local-manifest data/test.jsonl --language en

Modes mirror the reference (``run_evaluation.py:27-46``): ``eager`` (bf16),
``S`` (int8 weight-only once available), ``XL`` (bf16 engine) — all backed
by the same bucketed XLA executables (the "flexi-static" analog).
"""

import argparse
import logging
import os
import sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="HF checkpoint directory")
    ap.add_argument("--model-size", default="eager",
                    choices=["eager", "S", "XL"])
    ap.add_argument("--tasks", default="open_asr_en",
                    choices=["open_asr_en", "open_asr_multilingual"])
    ap.add_argument("--langs", nargs="*", default=None)
    ap.add_argument("--local-manifest", default=None,
                    help="jsonl manifest for offline evaluation")
    ap.add_argument("--language", default="en")
    ap.add_argument("--chunk-length", type=int, default=30,
                    choices=[10, 15, 20, 30])
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-samples", type=int, default=None)
    ap.add_argument("--max-new-tokens", type=int, default=256)
    ap.add_argument("--min-duration", type=float, default=0.0)
    # No duration cap by default: samples longer than the model chunk go
    # through the windowed LCS-merge path (reference evaluates any-length
    # samples through the HF chunked pipeline, run_evaluation.py:62-72).
    ap.add_argument("--max-duration", type=float, default=float("inf"))
    ap.add_argument("--noise-dir", default=None, help="MUSAN-style noise dir")
    ap.add_argument("--snr-db", type=float, default=None)
    ap.add_argument("--results", default="results/eval.json")
    ap.add_argument("--draft", default=None,
                    help='speculative decoding: "ngram", "layer-skip:N", '
                         "or a draft checkpoint/.npz (greedy-exact)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import data_utils
    import eval_utils
    from thewhisper_tpu.pipeline import ASRPipeline

    pipeline = ASRPipeline(
        args.model,
        model_size=None if args.model_size == "eager" else args.model_size,
        chunk_length_s=args.chunk_length,
        batch_size=args.batch_size,
        draft=args.draft,
    )

    noise_bank = (data_utils.NoiseBank(args.noise_dir)
                  if args.noise_dir else None)
    loader_kwargs = dict(
        max_samples=args.max_samples,
        min_duration_s=args.min_duration,
        max_duration_s=args.max_duration,
        noise_bank=noise_bank,
        snr_db=args.snr_db,
    )

    if args.local_manifest:
        samples = data_utils.load_manifest(args.local_manifest, **loader_kwargs)
        res = eval_utils.evaluate_dataset(
            pipeline, samples, language=args.language,
            batch_size=args.batch_size, max_new_tokens=args.max_new_tokens)
        eval_utils.merge_save_results(args.results, "local_manifest", res)
        ttft = (f"{res['ttft_s']:.3f}s" if res["ttft_s"] is not None
                else "n/a")
        print(f"WER {res['wer']:.2f}  CER {res['cer']:.2f}  "
              f"RTFx {res['rtfx']:.2f}  TTFT {ttft} "
              f"n={res['n_samples']}")
        return

    if args.tasks == "open_asr_en":
        tasks = data_utils.OPEN_ASR_EN_TASKS
    else:
        tasks = data_utils.open_asr_multilingual_tasks(args.langs)

    eval_utils.evaluate_whisper(
        pipeline, tasks, data_utils.load_hf_dataset,
        results_path=args.results, batch_size=args.batch_size,
        max_new_tokens=args.max_new_tokens, **loader_kwargs)


if __name__ == "__main__":
    main()
