"""Synthesize a tiny random HF Whisper checkpoint with the REAL vocab layout.

No network egress exists in this environment, so end-to-end flows are driven
with a random-weight checkpoint that is structurally identical to
``openai/whisper-large-v3`` style checkpoints: 51866-token vocab
(50257 byte-level BPE entries + <|endoftext|> + <|startoftranscript|> +
100 languages + task/timestamps block), ``model.safetensors``,
``config.json``, ``generation_config.json``, and a working
``tokenizer.json`` (byte-level decoder), loadable by both this framework
(``WhisperEngine.from_checkpoint``) and HF ``WhisperTokenizerFast``.

Usage: python tools/make_tiny_checkpoint.py OUTPUT_DIR [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


COMMON_WORDS = (
    "the of and to in is that it was for on are as with his they at be this "
    "have from or had by hot word but what some we can out other were all "
    "there when up use your how said an each she which do their time if will "
    "way about many then them write would like so these her long make thing "
    "see him two has look more day could go come did number sound no most "
    "people my over know water than call first who may down side been now "
    "find any new work part take get place made live where after back little "
    "only round man year came show every good me give our under name very "
    "through just form sentence great think say help low line differ turn "
    "cause much mean before move right boy old too same tell does set three "
    "want air well also play small end put home read hand port large spell "
    "add even land here must big high such follow act why ask men change "
    "went light kind off need house picture try us again animal point mother "
    "world near build self earth father head stand own page should country "
    "found answer school grow study still learn plant cover food sun four "
    "between state keep eye never last let thought city tree cross farm hard "
    "start might story saw far sea draw left late run don while press close "
    "night real life few north open seem together next white children begin "
    "got walk example ease paper group always music those both mark often "
    "letter until mile river car feet care second book carry took science "
    "eat room friend began idea fish mountain stop once base hear horse cut "
    "sure watch color face wood main enough plain girl usual young ready "
    "above ever red list though feel talk bird soon body dog family direct "
    "pose leave song measure door product black short numeral class wind "
    "question happen complete ship area half rock order fire south problem "
    "piece told knew pass since top whole king space heard best hour better "
    "true during hundred five remember step early hold west ground interest "
    "reach fast verb sing listen six table travel less morning ten simple "
    "several vowel toward war lay against pattern slow center love person "
    "money serve appear road map rain rule govern pull cold notice voice "
    "unit power town fine certain fly fall lead cry dark machine note wait "
    "plan figure star box noun field rest correct able pound done beauty "
    "drive stood contain front teach week final gave green oh quick develop "
    "ocean warm free minute strong special mind behind clear tail produce "
    "fact street inch multiply nothing course stay wheel full force blue "
    "object decide surface deep moon island foot system busy test record "
    "boat common gold possible plane stead dry wonder laugh thousand ago "
    "ran check game shape equate hot miss brought heat snow tire bring yes "
    "distant fill east paint language among"
).split()

LANGUAGES_100 = (
    "en zh de es ru ko fr ja pt tr pl ca nl ar sv it id hi fi vi he uk el ms "
    "cs ro da hu ta no th ur hr bg lt la mi ml cy sk te fa lv bn sr az sl kn "
    "et mk br eu is hy ne mn bs kk sq sw gl mr pa si km sn yo so af oc ka be "
    "tg sd gu am yi lo uz fo ht ps tk nn mt sa lb my bo tl mg as tt haw ln "
    "ha ba jw su yue"
).split()


def _bytes_to_unicode():
    """GPT-2 byte<->unicode map (mirrors tokenizers' ByteLevel alphabet)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def build_tokenizer(out_dir: str) -> None:
    from tokenizers import AddedToken, Tokenizer, decoders, models, pre_tokenizers

    b2u = _bytes_to_unicode()
    byte_chars = [b2u[b] for b in range(256)]

    vocab = {}
    for i, c in enumerate(byte_chars):
        vocab[c] = i
    idx = 256
    # Real-looking word tokens (with the byte-level space marker G-dot).
    merges = []
    for w in COMMON_WORDS:
        tok = "Ġ" + w
        if tok not in vocab:
            vocab[tok] = idx
            idx += 1
    # Filler entries up to the GPT-2-sized base vocab.
    while idx < 50257:
        vocab[f"Ġfill{idx}"] = idx
        idx += 1

    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges, unk_token=None,
                               fuse_unk=False))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()

    specials = ["<|endoftext|>", "<|startoftranscript|>"]
    specials += [f"<|{lang}|>" for lang in LANGUAGES_100]
    specials += ["<|translate|>", "<|transcribe|>", "<|startoflm|>",
                 "<|startofprev|>", "<|nospeech|>", "<|notimestamps|>"]
    specials += [f"<|{i * 0.02:.2f}|>" for i in range(1501)]
    tok.add_special_tokens([AddedToken(s, special=True) for s in specials])
    assert tok.get_vocab_size() == 51866, tok.get_vocab_size()

    tok.save(os.path.join(out_dir, "tokenizer.json"))
    with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as f:
        json.dump({
            "tokenizer_class": "WhisperTokenizerFast",
            "bos_token": "<|endoftext|>",
            "eos_token": "<|endoftext|>",
            "pad_token": "<|endoftext|>",
            "unk_token": "<|endoftext|>",
            "model_max_length": 448,
        }, f)


def build_model(out_dir: str, seed: int = 0) -> None:
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(seed)
    cfg = WhisperConfig(
        vocab_size=51866,
        num_mel_bins=128,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=2,
        decoder_attention_heads=4,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        max_source_positions=1500,
        max_target_positions=448,
        median_filter_width=7,
        bos_token_id=50257,
        eos_token_id=50257,
        pad_token_id=50256,
        decoder_start_token_id=50258,
    )
    model = WhisperForConditionalGeneration(cfg)
    model.save_pretrained(out_dir, safe_serialization=True)

    gen_cfg = {
        "alignment_heads": [[1, 0], [1, 2]],
        "begin_suppress_tokens": [220, 50257],
        "suppress_tokens": [],
        "decoder_start_token_id": 50258,
        "eos_token_id": 50257,
        "pad_token_id": 50256,
        "max_length": 448,
        "is_multilingual": True,
        "lang_to_id": {f"<|{lang}|>": 50259 + i
                       for i, lang in enumerate(LANGUAGES_100)},
        "task_to_id": {"translate": 50359, "transcribe": 50360},
        "no_timestamps_token_id": 50364,
    }
    with open(os.path.join(out_dir, "generation_config.json"), "w") as f:
        json.dump(gen_cfg, f, indent=2)
    # Feature-extractor config so HF's ASR pipeline can load the directory.
    with open(os.path.join(out_dir, "preprocessor_config.json"), "w") as f:
        json.dump({
            "feature_extractor_type": "WhisperFeatureExtractor",
            "feature_size": 128,
            "sampling_rate": 16000,
            "hop_length": 160,
            "n_fft": 400,
            "chunk_length": 30,
            "n_samples": 480000,
            "nb_max_frames": 3000,
            "padding_side": "right",
            "padding_value": 0.0,
            "processor_class": "WhisperProcessor",
            "return_attention_mask": False,
        }, f, indent=2)


def make_checkpoint(out_dir: str, seed: int = 0) -> str:
    os.makedirs(out_dir, exist_ok=True)
    build_model(out_dir, seed)
    build_tokenizer(out_dir)
    return out_dir


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    make_checkpoint(args.out_dir, args.seed)
    print(f"tiny checkpoint written to {args.out_dir}")
