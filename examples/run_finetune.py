"""Fine-tune a Whisper checkpoint on a local audio manifest (TPU mesh).

The reference ships no training code, but its flexible-chunk models ARE
fine-tunes; this CLI is the capability that produces them. Data comes from
a jsonl manifest ``{"audio": wav_path, "text": str}`` per line; the model
initializes from an HF checkpoint with interpolated positions at the target
chunk length (the same init the reference's NVIDIA path uses at inference,
``nvidia/asr_pipeline.py:15-27``), trains a teacher-forced CE objective on
a (dp, tp) mesh, and exports an HF-layout checkpoint.

Usage:
    python examples/run_finetune.py --model /ckpt --manifest train.jsonl \
        --chunk-length 10 --steps 100 --batch-size 8 --out /tuned_ckpt [--cpu]
"""

import argparse
import os
import sys

# Allow running from a source checkout without installation.
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="HF checkpoint directory")
    ap.add_argument("--manifest", required=True, help="jsonl {audio, text}")
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    ap.add_argument("--chunk-length", type=int, default=10,
                    choices=[10, 15, 20, 30])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--learning-rate", type=float, default=1e-5)
    ap.add_argument("--language", default="en")
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--dp", type=int, default=None)
    ap.add_argument("--tp", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize layers in backward (fit large-v3 "
                         "fine-tunes in 16 GB at ~1/3 extra FLOPs)")
    ap.add_argument("--save-every", type=int, default=0,
                    help="also save orbax train state every N steps")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from thewhisper_tpu.audio.features import LogMelFeaturizer
    from thewhisper_tpu.audio.io import load_audio
    from thewhisper_tpu.config import LANGUAGES, SpecialTokens
    from thewhisper_tpu.engine.engine import WhisperEngine
    from thewhisper_tpu.models.checkpoint import (
        save_hf_checkpoint,
        save_train_state,
    )
    from thewhisper_tpu.models.load import load_checkpoint
    from thewhisper_tpu.parallel import make_mesh, shard_params
    from thewhisper_tpu.pipeline import _try_load_hf_tokenizer
    from thewhisper_tpu.training import init_train_state, make_train_step
    from thewhisper_tpu.training.train import place_batch

    params, arch = load_checkpoint(
        args.model, dtype=jnp.float32, chunk_length_s=args.chunk_length,
        position_mode="interpolate")
    tokenizer = _try_load_hf_tokenizer(args.model)
    if tokenizer is None:
        raise SystemExit("checkpoint has no tokenizer files")

    sp = SpecialTokens.for_vocab(arch.vocab_size)
    lang_id = sp.language_id(args.language, LANGUAGES[: sp.n_languages])
    prompt = [sp.sot, lang_id, sp.transcribe, sp.no_timestamps]

    featurizer = LogMelFeaturizer(
        n_mels=arch.n_mels, chunk_length_s=args.chunk_length)

    # Materialize the dataset (fits for fine-tuning-sized manifests).
    samples = []
    with open(args.manifest) as f:
        for line in f:
            item = json.loads(line)
            audio = load_audio(item["audio"])[: args.chunk_length * 16000]
            ids = tokenizer.encode(item["text"], add_special_tokens=False)
            ids = prompt + list(ids[: args.max_tokens - len(prompt) - 1]) + [sp.eot]
            samples.append((audio, ids))
    if not samples:
        raise SystemExit("empty manifest")
    print(f"{len(samples)} training samples")

    mesh = make_mesh(dp=args.dp, tp=args.tp)
    print(f"mesh: dp={mesh.devices.shape[0]} tp={mesh.devices.shape[1]}")
    params = shard_params(params, mesh)
    state, tx = init_train_state(params, learning_rate=args.learning_rate)
    train_step = make_train_step(arch, tx, remat=args.remat)

    rng = np.random.default_rng(0)
    seq_len = args.max_tokens

    def make_batch():
        idx = rng.integers(0, len(samples), args.batch_size)
        mel = np.zeros((args.batch_size, arch.n_mels,
                        args.chunk_length * 100), np.float32)
        tokens = np.full((args.batch_size, seq_len), sp.eot, np.int32)
        mask = np.zeros((args.batch_size, seq_len), np.float32)
        audios = [samples[i][0] for i in idx]
        padded = np.zeros((args.batch_size, args.chunk_length * 16000), np.float32)
        for bi, a in enumerate(audios):
            padded[bi, : len(a)] = a
        mel[:] = np.asarray(featurizer(padded))
        for bi, i in enumerate(idx):
            ids = samples[i][1][:seq_len]
            tokens[bi, : len(ids)] = ids
            # Loss on the transcript + EOT, not the forced prompt.
            mask[bi, len(prompt): len(ids)] = 1.0
        return place_batch(
            {"mel": mel, "tokens": tokens, "loss_mask": mask}, mesh)

    for it in range(args.steps):
        state, loss = train_step(state, make_batch())
        if it % 10 == 0 or it == args.steps - 1:
            print(f"step {it:5d}  loss {float(loss):.4f}")
        if args.save_every and it and it % args.save_every == 0:
            save_train_state(state, os.path.join(args.out, f"state_{it}"))

    # chunk_length_s marks the export as a flexible-chunk fine-tune so
    # reloading auto-selects position_mode="truncate" (models/load.py's
    # detection) instead of wrongly interpolating.
    save_hf_checkpoint(state.params, arch, args.out,
                       chunk_length_s=args.chunk_length)
    # Carry the tokenizer along so the output directory is self-contained.
    for fname in ("tokenizer.json", "tokenizer_config.json", "vocab.json",
                  "merges.txt", "normalizer.json", "added_tokens.json",
                  "special_tokens_map.json"):
        src = os.path.join(args.model, fname)
        if os.path.exists(src):
            import shutil

            shutil.copyfile(src, os.path.join(args.out, fname))
    print(f"fine-tuned checkpoint written to {args.out}")


if __name__ == "__main__":
    main()
