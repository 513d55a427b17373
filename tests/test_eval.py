"""WER / normalizer / eval-harness tests."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "benchmark")

from thewhisper_tpu.utils.normalizers import BasicTextNormalizer, EnglishTextNormalizer
from thewhisper_tpu.utils.wer import align_words, cer, edit_stats, wer


def test_edit_stats():
    st = edit_stats("a b c d".split(), "a x c".split())
    assert st["subs"] == 1 and st["dels"] == 1 and st["ins"] == 0
    assert st["hits"] == 2 and st["errors"] == 2

    st = edit_stats([], "a b".split())
    assert st["ins"] == 2 and st["ref_len"] == 0


def test_wer_corpus():
    refs = ["the cat sat", "hello world"]
    hyps = ["the cat sat", "hello there world"]
    # 1 insertion over 5 reference words
    assert abs(wer(refs, hyps) - 1 / 5) < 1e-9
    assert wer(refs, refs) == 0.0
    assert cer(["abc"], ["abd"]) == pytest.approx(1 / 3)


def test_align_words():
    ops = align_words("a b c".split(), "a x c d".split())
    kinds = [o[0] for o in ops]
    assert kinds == ["equal", "sub", "equal", "ins"]


def test_basic_normalizer():
    n = BasicTextNormalizer()
    assert n("Hello, World!") == "hello world"
    assert n("this [NOISE] is (um) fine") == "this is fine"
    assert n("  a   b  ") == "a b"


def test_english_normalizer():
    n = EnglishTextNormalizer()
    assert n("I won't do it.") == "i will not do it"
    # Leaderboard semantics: titles expand, "'s" becomes "is".
    assert n("It's Mr. Smith's colour TV") == "it is mister smith is color tv"
    assert n("twenty two dogs") == "22 dogs"
    assert n("one hundred and five") == "105"
    assert n("three thousand two hundred") == "3200"
    assert n("the first time") == "the 1st time"
    assert n("Uh, hello um world") == "hello world"
    assert n("100% of $5") == "100% of $5"


def test_english_normalizer_numbers_full():
    """Leaderboard-exact coverage (round-2 review #5): hyphenated
    compounds, 'a hundred' with the article kept, compound ordinals,
    minus, decimal multipliers, currency in SYMBOL form."""
    n = EnglishTextNormalizer()
    assert n("twenty-two dogs") == "22 dogs"
    assert n("a hundred people") == "a 100 people"
    assert n("a thousand and one nights") == "a 1001 nights"
    assert n("the twenty-first century") == "the 21st century"
    assert n("his thirty third birthday") == "his 33rd birthday"
    assert n("one hundredth of a second") == "100th of a 2nd"
    assert n("minus five degrees") == "-5 degrees"
    assert n("three point five million dollars") == "$3500000"
    assert n("point is moot") == "point is moot"
    assert n("two point oh") == "2.0"
    assert n("fifty thousand") == "50000"
    assert n("seven hundred and eighty-nine") == "789"
    # Year-style concatenation (whisper digit-string semantics).
    assert n("nineteen eighty four") == "1984"
    assert n("twenty twenty") == "2020"
    assert n("nineteen oh five") == "1905"
    assert n("double oh seven") == "007"
    # Currency keeps the leaderboard SYMBOL form.
    assert n("two dollars") == "$2"
    assert n("$2.50") == "$2.50"
    assert n("two dollars and fifty cents") == "$2.50"
    assert n("two dollars and five cents") == "$2.05"
    assert n("fifty cents") == "¢50"
    assert n("$0.50") == "¢50"
    assert n("five pounds") == "£5"
    assert n("£3") == "£3"
    assert n("3%") == "3%"
    assert n("three per cent") == "3%"
    # Standalone "1" is written "one" (leaderboard readability rule).
    assert n("1 of them") == "one of them"
    assert n("one of them") == "one of them"


def test_english_normalizer_contractions_full():
    n = EnglishTextNormalizer()
    assert n("I'm gonna go, you wanna come?") == \
        "i am going to go you want to come"
    assert n("she'd been there") == "she had been there"
    assert n("he's got it") == "he has got it"
    assert n("Dr. Brown and Mrs. Jones") == "doctor brown and missus jones"
    assert n("y'all shoulda seen it") == "you all should have seen it"
    assert n("it's fine") == "it is fine"


def test_english_normalizer_spellings_generated():
    n = EnglishTextNormalizer()
    cases = {
        "colourful neighbourhood": "colorful neighborhood",
        "organisations prioritised": "organizations prioritized",
        "paralysed by analysing": "paralyzed by analyzing",
        "the theatre's centre": "the theater is center",
        "travelling jewellers quarrelled": "traveling jewelers quarreled",
        "defenceless offences": "defenseless offenses",
        "paediatrician manoeuvred": "pediatrician maneuvered",
        "kilometres of grey tyres": "kilometers of gray tires",
        "fulfilment of enrolment": "fulfillment of enrollment",
        "he practised his programme": "he practiced his program",
        "catalogues and dialogues": "catalogs and dialogs",
    }
    for src, want in cases.items():
        assert n(src) == want, (src, n(src))
    # Words that are -ise in both dialects must NOT be converted.
    for w in ("surprise", "advise", "compromise", "exercise", "promise",
              "televise", "franchise", "disguise"):
        assert n(w) == w


def test_multilingual_task_golden():
    """Pin every (path, config, split, text_key) to the reference protocol.

    The upstream dataset configs are NOT derivable from language codes
    (google/fleurs uses es_419/pt_br, MLS uses full names, CoVoST2 uses
    xx_en pairs) and a wrong tuple only fails at network time — this golden
    list is the offline guard (reference data_utils.py:338-398).
    """
    import data_utils

    golden = [
        # MLS block (reference :347-362): full-name configs, 'transcript'.
        ("mls_french_test", "facebook/multilingual_librispeech", "french",
         "test", "transcript", "fr"),
        ("mls_italian_test", "facebook/multilingual_librispeech", "italian",
         "test", "transcript", "it"),
        ("mls_spanish_test", "facebook/multilingual_librispeech", "spanish",
         "test", "transcript", "es"),
        ("mls_portuguese_test", "facebook/multilingual_librispeech",
         "portuguese", "test", "transcript", "pt"),
        ("mls_german_test", "facebook/multilingual_librispeech", "german",
         "test", "transcript", "de"),
        # CoVoST2 block (reference :381-396): xx_en configs, 'sentence'.
        ("covost2_fr_test", "fixie-ai/covost2", "fr_en", "test", "sentence", "fr"),
        ("covost2_it_test", "fixie-ai/covost2", "it_en", "test", "sentence", "it"),
        ("covost2_es_test", "fixie-ai/covost2", "es_en", "test", "sentence", "es"),
        ("covost2_pt_test", "fixie-ai/covost2", "pt_en", "test", "sentence", "pt"),
        ("covost2_de_test", "fixie-ai/covost2", "de_en", "test", "sentence", "de"),
        # FLEURS block (reference :364-379): regioned configs.
        ("fleurs_fr_test", "google/fleurs", "fr_fr", "test", "transcription", "fr"),
        ("fleurs_it_test", "google/fleurs", "it_it", "test", "transcription", "it"),
        ("fleurs_es_test", "google/fleurs", "es_419", "test", "transcription", "es"),
        ("fleurs_pt_test", "google/fleurs", "pt_br", "test", "transcription", "pt"),
        ("fleurs_de_test", "google/fleurs", "de_de", "test", "transcription", "de"),
    ]
    tasks = data_utils.open_asr_multilingual_tasks()
    got = [(t["name"], t["path"], t["config"], t["split"], t["text_key"],
            t["language"]) for t in tasks]
    assert sorted(got) == sorted(golden)
    # Reference block order: MLS, CoVoST2, FLEURS.
    assert [t["path"] for t in tasks] == (
        ["facebook/multilingual_librispeech"] * 5
        + ["fixie-ai/covost2"] * 5 + ["google/fleurs"] * 5)

    # Extended languages must use real config names too, never xx_xx forms.
    ext = data_utils.open_asr_multilingual_tasks(["en", "ru", "ar", "hi", "id"])
    fleurs_cfgs = {t["config"] for t in ext if t["path"] == "google/fleurs"}
    assert fleurs_cfgs == {"en_us", "ru_ru", "ar_eg", "hi_in", "id_id"}


def test_mix_noise_at_snr():
    import data_utils

    rng = np.random.default_rng(0)
    sig = rng.standard_normal(16000).astype(np.float32)
    noise = rng.standard_normal(8000).astype(np.float32)
    for snr in (0.0, 10.0):
        mixed = data_utils.mix_noise_at_snr(sig, noise, snr)
        added = mixed - sig
        p_sig = np.mean(sig ** 2)
        p_noise = np.mean(added ** 2)
        measured = 10 * np.log10(p_sig / p_noise)
        assert abs(measured - snr) < 0.5


def test_evaluate_dataset_with_fake_pipeline(tmp_path):
    import data_utils
    import eval_utils

    class FakePipeline:
        def transcribe_batch(self, audios, **kw):
            # Echo a transcript derived from audio length (deterministic).
            return [{"text": "hello world"} for _ in audios]

    samples = [
        data_utils.EvalSample(
            audio=np.zeros(16000, np.float32), text="hello world",
            duration_s=1.0, id=str(i))
        for i in range(5)
    ] + [
        data_utils.EvalSample(
            audio=np.zeros(16000, np.float32), text="goodbye world",
            duration_s=1.0, id="bad")
    ]
    res = eval_utils.evaluate_dataset(FakePipeline(), samples, batch_size=4)
    assert res["n_samples"] == 6
    # 5 perfect + 1 with 1 sub of 2 words -> corpus WER = 1/12
    assert res["wer"] == pytest.approx(100 / 12, rel=1e-6)
    assert res["rtfx"] > 0

    merged = eval_utils.merge_save_results(
        str(tmp_path / "r.json"), "fake_task", res)
    assert "fake_task" in merged
    # Rerun merge keeps previous entries.
    merged = eval_utils.merge_save_results(
        str(tmp_path / "r.json"), "other", {"wer": 1.0})
    assert set(merged) == {"fake_task", "other"}


def test_evaluate_dataset_long_form_routing():
    """Samples longer than the model chunk must go through the windowed
    __call__ (LCS merge), not the single-window truncating fast path."""
    import data_utils
    import eval_utils

    calls = {"batch": [], "windowed": []}

    class FakePipeline:
        model_chunk_length_s = 2.0

        def transcribe_batch(self, audios, **kw):
            calls["batch"].extend(len(a) for a in audios)
            return [{"text": "short sample"} for _ in audios]

        def __call__(self, audio, **kw):
            calls["windowed"].append(len(audio))
            return {"text": "long sample fully transcribed"}

    samples = [
        data_utils.EvalSample(audio=np.zeros(16000, np.float32),
                              text="short sample", duration_s=1.0, id="s"),
        data_utils.EvalSample(audio=np.zeros(7 * 16000, np.float32),
                              text="long sample fully transcribed",
                              duration_s=7.0, id="l"),
    ]
    res = eval_utils.evaluate_dataset(FakePipeline(), samples, batch_size=4)
    assert calls["windowed"] == [7 * 16000]
    assert calls["batch"] == [16000]
    assert res["wer"] == 0.0
    assert res["n_samples"] == 2


def test_evaluate_dataset_long_form_real_engine(tiny_eval_pipeline):
    """Integration: a sample longer than the chunk is transcribed across
    its full length (windows past the first produce text too)."""
    import data_utils
    import eval_utils

    rng = np.random.default_rng(0)
    long_audio = (0.1 * rng.standard_normal(7 * 16000)).astype(np.float32)
    samples = [data_utils.EvalSample(audio=long_audio, text="x", duration_s=7.0)]
    res = eval_utils.evaluate_dataset(
        tiny_eval_pipeline, samples, max_new_tokens=8)
    assert res["n_samples"] == 1
    # The windowed path must produce at least as much text as one window.
    single = tiny_eval_pipeline.transcribe_batch(
        [long_audio], return_timestamps=False,
        generate_kwargs={"max_new_tokens": 8, "language": "en"})[0]["text"]
    full = tiny_eval_pipeline(
        long_audio, generate_kwargs={"max_new_tokens": 8, "language": "en"})["text"]
    assert len(full) >= len(single)


@pytest.fixture(scope="module")
def tiny_eval_pipeline():
    import dataclasses

    from thewhisper_tpu.config import ARCH_PRESETS, SpecialTokens
    from thewhisper_tpu.engine import WhisperEngine
    from thewhisper_tpu.models.whisper import init_params
    from thewhisper_tpu.pipeline import ASRPipeline

    arch = dataclasses.replace(
        ARCH_PRESETS["tiny"],
        d_model=64, encoder_layers=2, encoder_heads=4, decoder_layers=2,
        decoder_heads=4, d_ff=128, vocab_size=200, n_mels=80,
        max_source_positions=150, max_target_positions=64,
        alignment_heads=((1, 0),),
    )
    sp = SpecialTokens(eot=101, sot=102, first_language=110, n_languages=5,
                       translate=120, transcribe=121, no_speech=122,
                       no_timestamps=123, timestamp_begin=124)
    eng = WhisperEngine(init_params(arch, seed=3), arch, special=sp,
                        batch_buckets=(1, 2, 4))

    class MapTok:
        def decode(self, ids, skip_special_tokens=True):
            return "".join(f" w{int(i)}" for i in ids if int(i) < 90)

    return ASRPipeline(eng, tokenizer=MapTok(), chunk_length_s=3)


def test_manifest_loader(tmp_path):
    import data_utils
    from thewhisper_tpu.audio.io import save_wav

    wavs = []
    for i in range(3):
        p = str(tmp_path / f"{i}.wav")
        save_wav(p, np.zeros(16000 * (i + 1), np.float32))
        wavs.append(p)
    manifest = tmp_path / "m.jsonl"
    with open(manifest, "w") as f:
        for i, p in enumerate(wavs):
            f.write(json.dumps({"audio": p, "text": f"sample {i}"}) + "\n")

    samples = list(data_utils.load_manifest(str(manifest)))
    assert len(samples) == 3
    assert samples[2].duration_s == pytest.approx(3.0)

    # Duration filter.
    samples = list(data_utils.load_manifest(
        str(manifest), max_duration_s=1.5))
    assert len(samples) == 1


def test_english_normalizer_decimals():
    n = EnglishTextNormalizer()
    assert n("three point one four") == "3.14"
    assert n("twenty two point five percent") == "22.5%"
    # "point" without a preceding number stays a word.
    assert n("the point is clear") == "the point is clear"


def test_english_normalizer_transducer_branches():
    """Golden cases for the round-3 transducer rewrite — each output
    verified against the transformers-vendored leaderboard normalizer
    (the fuzz test covers these statistically; these document the
    branch semantics individually)."""
    n = EnglishTextNormalizer()
    # Decimal attach to a pending LITERAL value; bare/signed fractions.
    assert n("one point five") == "one.5"
    assert n("minus point five") == "-.5"
    assert n("minus one point five") == "-one.5"
    # Fraction x multiplier only when the product is integral.
    assert n("point two hundred") == "20"
    assert n("one point five million") == "1500000"
    assert n("zero point twelve five hundred") == "0.125 100"
    # The one fraction idiom: "and a half".
    assert n("one and a half million") == "1500000"
    assert n("five and a half percent") == "5.5%"
    # Spoken-suffix ordinals concat onto the pending value.
    assert n("one second") == "12nd"
    assert n("twenty first") == "21st"
    assert n("five point third") == "53rd"
    # Plural suffixed forms.
    assert n("two sixes") == "26s"   # suffixed forms concat too
    assert n("the twenties") == "the 20s"
    # Literal digit tokens join currency/multipliers.
    assert n("seven cents") == "¢7"
    assert n("1.5 million") == "1500000"
    assert n("3 dollars and 7 cents") == "$3.07"
    # Falsy-0 erasure (leaderboard bug, kept for parity).
    assert n("zero million zero second three") == "02nd 3"
    # "and" swallowed after any multiplier.
    assert n("a hundred and five") == "a 105"


def test_english_normalizer_matches_vendored_leaderboard_corpus():
    """Differential golden test vs the EXACT leaderboard normalizer
    (transformers vendors whisper's english_normalizer — the same code
    the Open-ASR-Leaderboard runs; reference pins it via
    ``asr_postprocess/ml_normalizer.py:1-11``). Round-2 review #5: WERs
    computed here must be comparable with the reference's published
    tables, so currency/percent keep the SYMBOL form and number-word runs
    follow whisper's digit-string concat semantics. Token-sequence
    equality (WER tokenizes on whitespace). The oracle is built with an
    empty spelling dict: our generated British->American table applies
    where the leaderboard would use whisper's english.json, so the corpus
    below avoids spelling-table words."""
    pytest.importorskip("transformers")
    from transformers.models.whisper.english_normalizer import (
        EnglishTextNormalizer as Vendored,
    )

    gold, ours = Vendored({}), EnglishTextNormalizer()
    corpus = [
        "$2.50", "£3", "3%", "two dollars", "two dollars and fifty cents",
        "$2", "$0.50", "fifty cents", "3 percent", "three per cent",
        "I paid $1,000 for it.", "it's 100%", "€5 and ¢75", "one percent",
        "a 20% tip on $45.50", "3.5 percent", "1%", "twenty-five dollars",
        "a hundred and five", "three point one four", "twenty first of June",
        "I won't go, 'cause he can't", "fifty thousand people",
        "one hundred percent", "hundred people", "It costs £3.99 or €4",
        "2%", "100 per cent sure", "a thousand times", "a second chance",
        "the second one", "a million dollars", "1s", "minus three degrees",
        "nineteen eighty four", "twenty seventeen", "two thousand and one",
        "he has got a cold", "she's been here", "Dr. Jones and Mrs. Smith",
        "y'all gonna wanna see this", "seven hundred and seventy seven",
        "zero point five", "twelve point oh five", "50 thousand",
        "sixty-six", "1,234,567", "twenty twenty", "nineteen oh five",
        "two thousand nineteen", "sixty one", "five oh nine",
        "zero zero seven", "oh seven", "one twenty three", "twelve fifty",
        "three hundred sixty five", "nineteen hundred", "seven six two",
        "ten ten", "twenty o three", "one oh one", "thirty thirty",
        "eleven eleven", "five thousand two hundred", "nine eleven",
        "two two two", "one hundred and one", "six hundred sixty six",
        "thousand", "one thousand one", "million", "a million and one",
        "one", "one dog", "two", "one hundred", "one two", "two one",
        "one million", "ten", "a one", "number one", "one and two",
        "no one", "someone", "two point", "ten point two", "negative five",
        "minus five dollars", "double seven", "triple six",
        "three quarters", "first", "twenty first", "hundredth",
        "fifth avenue", "five seconds", "in nineteen sixty-nine",
        "five oh", "back to square one", "chapter one", "zero tolerance",
        "double oh seven", "three double five", "one one",
        "two hundred and five dollars", "one thousand and twenty",
        "seconds", "thirds", "half a million", "one dollar", "one cent",
        "percent of people", "a large percentage", "percent",
        "five pounds of flour", "pounds of flour",
        "one hundred twenty three thousand four hundred fifty six",
    ]
    diffs = [(c, gold(c), ours(c)) for c in corpus
             if gold(c).split() != ours(c).split()]
    assert not diffs, diffs


def test_english_normalizer_differential_fuzz_vs_transformers():
    """Seeded 3000-phrase differential fuzz against the exact normalizer
    the leaderboard runs (transformers vendors it). Token-level equality
    — whitespace differences are invisible to WER. This pins the
    transducer semantics the round-3 rewrite replicated branch-for-
    branch, including the bug-for-bug corners (falsy-0 erasure, the
    unescaped extract_cents dot, consuming symbol strips, spoken-suffix
    ordinals like 'one second' -> 12nd)."""
    import random

    pytest.importorskip("transformers")
    from transformers.models.whisper.english_normalizer import (
        EnglishTextNormalizer as HFNorm,
    )

    from thewhisper_tpu.utils.normalizers import EnglishTextNormalizer

    h, m = HFNorm({}), EnglishTextNormalizer()
    rng = random.Random(7)
    vocab = ["one", "two", "three", "five", "nine", "twelve", "nineteen",
             "twenty", "forty", "fifty", "ninety", "hundred", "thousand",
             "million", "point", "oh", "zero", "and", "a", "half",
             "percent", "dollars", "cents", "first", "second", "third",
             "the", "price", "was", "about", "over", "nearly", "in",
             "year", "minus", "negative", "double", "sixes", "twenties",
             "millionth", "22", "7", "1.5", "per", "cent", "plus",
             "pounds", "euros", "o", "twentieth", "hundredth", "sat"]
    bad = []
    for _ in range(3000):
        phrase = " ".join(rng.choice(vocab)
                          for _ in range(rng.randint(1, 9)))
        a, b = h(phrase), m(phrase)
        if a.split() != b.split():
            bad.append((phrase, a, b))
    assert not bad, bad[:5]
