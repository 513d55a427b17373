"""asr_postprocess tests: rules, LLM classification, guards, optimization."""

import json
import sys

import pytest

sys.path.insert(0, ".")

from asr_postprocess.analyze_errors import (
    CATEGORIES,
    analyze_pair,
    merge_mismatches,
    preclassify,
)
from asr_postprocess.apply_correction import safe_correct
from asr_postprocess.dashboard import render_report
from asr_postprocess.optimize_prompt import optimize_prompt, stratified_split
from thewhisper_tpu.utils.wer import align_words


def test_preclassify_rules():
    assert preclassify({"ref_words": ["ice", "cream"],
                        "hyp_words": ["icecream"]}, "en") == "WORD_BOUNDARY"
    assert preclassify({"ref_words": ["big", "dog"],
                        "hyp_words": ["dog", "big"]}, "en") == "WORD_ORDER"
    assert preclassify({"ref_words": [], "hyp_words": ["s"]},
                       "en") == "CLITIC_MARKER"
    assert preclassify({"ref_words": ["t"], "hyp_words": ["not"]},
                       "en") == "CLITIC_MARKER"
    assert preclassify({"ref_words": [], "hyp_words": ["extra"]},
                       "en") == "SPURIOUS_INSERTION"
    assert preclassify({"ref_words": ["gone"], "hyp_words": []},
                       "en") == "OMISSION"
    assert preclassify({"ref_words": ["cat"], "hyp_words": ["hat"]},
                       "en") is None


def test_merge_mismatches_bridging():
    ops = align_words("a b c d e".split(), "x b y d e".split())
    # a->x, equal b, c->y: the single equal word bridges into one span.
    spans = merge_mismatches(ops, max_gap=1)
    assert len(spans) == 1
    assert spans[0]["ref_words"] == ["a", "b", "c"]
    assert spans[0]["hyp_words"] == ["x", "b", "y"]


def test_analyze_pair_without_llm():
    out = analyze_pair("the big cat sat", "the dog cat sat", lang="en")
    assert out["subs"] == 1 and out["wer"] == pytest.approx(25.0)
    cats = [m["category"] for m in out["mismatches"]]
    assert cats == ["OTHER"]  # substitution needs the LLM; defaults to OTHER


def test_analyze_pair_with_fake_llm():
    def fake_llm(prompt):
        assert "MISMATCHES" in prompt
        return json.dumps({"classifications": [
            {"index": 0, "category": "SEMANTIC_CHANGE"}]})

    out = analyze_pair("the big cat", "the dog cat", lang="en", llm=fake_llm)
    assert out["mismatches"][0]["category"] == "SEMANTIC_CHANGE"

    def garbage_llm(prompt):
        return "I think this is... not json"

    out = analyze_pair("the big cat", "the dog cat", lang="en", llm=garbage_llm)
    assert out["mismatches"][0]["category"] == "OTHER"


def test_safe_correct_guards():
    baseline = "the cat sat on the mat"

    out, leak, rej = safe_correct(lambda p: "the cat sat on the mat",
                                  baseline)
    assert out == baseline and not leak and not rej

    # Reasoning leak -> fallback.
    out, leak, rej = safe_correct(
        lambda p: "Wait, let me think... " + baseline * 3, baseline)
    assert out == baseline and leak

    # Too many edits -> rejected.
    out, leak, rej = safe_correct(
        lambda p: "a completely different sentence altogether now",
        baseline, max_edits=2)
    assert out == baseline and rej

    # Exception -> silent fallback.
    def boom(p):
        raise RuntimeError("no llm")

    out, leak, rej = safe_correct(boom, baseline)
    assert out == baseline and not leak and not rej

    # A small legitimate fix passes.
    out, leak, rej = safe_correct(
        lambda p: "the cat sat on the hat", baseline, max_edits=2)
    assert out == "the cat sat on the hat" and not leak and not rej


def test_optimize_prompt_with_fake_llm():
    # The fake "LLM" fixes "teh"->"the" only when the prompt says "typos".
    def llm(prompt):
        hyp = prompt.rsplit("TRANSCRIPTION:", 1)[1].strip()
        if "typos" in prompt:
            return hyp.replace("teh", "the")
        return hyp

    samples = (
        [{"ref": "the cat sat", "hyp": "teh cat sat"}] * 6
        + [{"ref": "a clean one", "hyp": "a clean one"}] * 6
    )
    best, best_wer, trials = optimize_prompt(
        llm, samples, n_dev=8, seed=0, proposer=False, max_demos=0)
    assert best is not None and "typos" in best
    assert best_wer == 0.0
    assert len(trials) == 9


def test_optimize_prompt_instruction_proposal_and_demos():
    """The MIPROv2-style stages: proposer-LLM instructions grounded in
    observed errors enter the search, and bootstrapped few-shot demos are
    tried under the winning instruction."""
    from asr_postprocess.optimize_prompt import (
        bootstrap_demos,
        propose_instructions,
        render_template,
    )

    # Correction LLM: perfect only under the proposed magic instruction;
    # the seed instructions' "typos" fixes teh->the but not "wrld".
    def llm(prompt):
        hyp = prompt.rsplit("TRANSCRIPTION:", 1)[-1].strip()
        out = hyp
        if "typos" in prompt:
            out = out.replace("teh", "the")
        if "MAGIC-RULE" in prompt:
            out = out.replace("teh", "the").replace("wrld", "world")
        return out

    # Proposer LLM: returns a numbered list; one candidate carries the
    # magic marker. It must see the observed errors in its prompt.
    seen_evidence = {}

    def proposer(prompt):
        seen_evidence["has_pairs"] = ("ASR OUTPUT" in prompt
                                      and "CORRECT" in prompt)
        return ("1. Please fix transcription mistakes using the MAGIC-RULE "
                "of this domain without paraphrasing anything at all.\n"
                "2. Repair the text gently and never ever paraphrase any "
                "content words.\n")

    samples = (
        [{"ref": "the world is", "hyp": "teh wrld is"}] * 6
        + [{"ref": "a clean one", "hyp": "a clean one"}] * 6
    )
    dev = samples[:8]
    props = propose_instructions(proposer, dev, n=4)
    assert len(props) == 2 and "MAGIC-RULE" in props[0]
    assert seen_evidence["has_pairs"]

    best, best_wer, trials = optimize_prompt(
        llm, samples, n_dev=8, seed=0, proposer=proposer)
    assert best is not None and "MAGIC-RULE" in best
    assert best_wer == 0.0
    # 3 seeds + 2 proposals, x3 modifiers (+ possible demo trial).
    assert len(trials) >= 15

    # Demo bootstrapping: a dirty pair the prompt fixes becomes a demo.
    base = render_template("Fix typos please and thanks kindly today.",
                           "Do not paraphrase anything in the text.")
    demos = bootstrap_demos(llm, [{"ref": "the cat", "hyp": "teh cat"}],
                            base, max_demos=2)
    assert demos == [{"hyp": "teh cat", "ref": "the cat"}]
    t = render_template("A {weird} instruction.", "No change.", demos)
    assert t.format(hyp="x")   # demo/instruction braces are escaped


def test_stratified_split():
    samples = ([{"ref": "x", "hyp": "x"}] * 10
               + [{"ref": "x", "hyp": "y"}] * 10)
    dev = stratified_split(samples, 10, seed=1)
    clean = sum(1 for s in dev if s["ref"] == s["hyp"])
    assert clean == 5 and len(dev) == 10


def test_render_report(tmp_path):
    analyses = [
        analyze_pair("the big cat sat", "the dog cat", lang="en"),
        analyze_pair("hello world", "hello world", lang="en"),
    ]
    path = render_report(analyses, path=str(tmp_path / "r.html"))
    text = open(path).read()
    assert "corpus WER" in text and "<svg" in text
    assert "dog" in text


def test_load_reference_optimized_program(tmp_path):
    """dspy-MIPROv2 program exports (the reference ships six per-language
    ones under asr_postprocess/experiments/opt_trb/prompts/) load directly
    as safe_correct templates — a migrating user's optimized artifacts
    keep working (round-2 review gap #2)."""
    import json as _json

    from asr_postprocess.apply_correction import (
        load_optimized_program,
        safe_correct,
    )

    prog = {
        "traces": [], "train": [],
        "demos": [
            {"augmented": True,
             "hypotheses": " the whether was nice",
             "corrected_transcription": "The weather was nice"},
        ],
        "signature": {
            "instructions": "You are an expert ASR post-processor. "
                            "Fix errors, return only the corrected text.",
            "fields": [
                {"prefix": "Hypotheses:", "description": "ASR hypothesis"},
                {"prefix": "Corrected Transcription:",
                 "description": "corrected text only"},
            ],
        },
        "lm": None,
        "metadata": {"dependency_versions": {"dspy": "3.1.3"}},
    }
    p = tmp_path / "optimized_program_en_test.json"
    p.write_text(_json.dumps(prog))
    template = load_optimized_program(str(p))
    # Instruction, demo pair, and the open-ended live block all render.
    assert "expert ASR post-processor" in template
    assert "the whether was nice" in template
    assert template.rstrip().endswith("Corrected Transcription:")
    rendered = template.format(hyp="he red a book")
    assert "Hypotheses: he red a book" in rendered

    seen = {}
    def fake_llm(prompt):
        seen["prompt"] = prompt
        return "he read a book"

    out, leaked, rejected = safe_correct(
        fake_llm, "he red a book", prompt_template=template)
    assert out == "he read a book" and not leaked and not rejected
    assert "Hypotheses: he red a book" in seen["prompt"]

    # The real reference artifacts (available in this environment) load
    # with the same code path.
    import glob
    import os

    real = sorted(glob.glob(
        "/root/reference/asr_postprocess/experiments/opt_trb/prompts/"
        "optimized_program_en_*.json"))
    if real and os.access(real[0], os.R_OK):
        t = load_optimized_program(real[0])
        assert t.rstrip().endswith("Corrected Transcription:")
        out, leaked, rejected = safe_correct(
            fake_llm, "he red a book", prompt_template=t)
        assert out == "he read a book" and not rejected
        assert "he red a book" in seen["prompt"]


def test_load_leaderboard_results_jsonl(tmp_path):
    """The reference publishes per-model FLEURS result manifests
    (``results/MODEL_*_DATASET_*.jsonl``: text/pred_text, fractional wer,
    per-error spans). load_results_jsonl maps them to our analysis schema
    so the dashboard and summaries consume them directly."""
    import json

    from asr_postprocess.analyze_errors import load_results_jsonl, summarize

    rec = {
        "audio_filepath": "sample_0", "duration": 12.6, "idx": 0,
        "text": "one hundred percent certainty.",
        "pred_text": " 100% certainty.",
        "wer": 0.25, "ref_words": 4, "subs": 0, "dels": 1, "ins": 0,
        "errors": [{"category": "OMISSION", "ref_words": ["percent"],
                    "hyp_words": [], "sdi": {"S": 0, "D": 1, "I": 0}}],
        "text_norm": "one hundred percent certainty",
        "pred_text_norm": "one hundred certainty",
    }
    p = tmp_path / "MODEL_x_DATASET_y_fleurs_en_test.jsonl"
    p.write_text(json.dumps(rec) + "\n")
    (a,) = load_results_jsonl(str(p))
    assert a["ref"] == "one hundred percent certainty"
    assert a["hyp"] == "one hundred certainty"
    assert a["wer"] == 25.0 and a["dels"] == 1
    assert a["mismatches"][0]["category"] == "OMISSION"
    s = summarize([a], "fleurs_en_test")
    assert s["categories"] == {"OMISSION": 1}

    # Our native {ref,hyp} manifests pass through untouched.
    q = tmp_path / "native.jsonl"
    q.write_text(json.dumps({"ref": "a b", "hyp": "a c"}) + "\n")
    (b,) = load_results_jsonl(str(q))
    assert b == {"ref": "a b", "hyp": "a c"}

    # The dashboard renders straight from the mapped records.
    from asr_postprocess.dashboard import render_report

    out = render_report([a], path=str(tmp_path / "r.html"))
    assert "OMISSION" in open(out).read()


def test_reference_results_summary_parity():
    """Category counts recovered from the reference's published EN result
    manifest must equal its own summary_*.json (validated exact in-image;
    skipped where the read-only reference tree is absent)."""
    import json
    import os

    import pytest

    from asr_postprocess.analyze_errors import load_results_jsonl, summarize

    base = "/root/reference/asr_postprocess/results"
    man = os.path.join(
        base, "MODEL_TheStageAI-thewhisper-large-v3-turbo_DATASET_"
        "nithinraok-asr-leaderboard-datasets_fleurs_en_test.jsonl")
    summ = os.path.join(
        base, "summary_TheStageAI-thewhisper-large-v3-turbo.json")
    if not (os.path.exists(man) and os.path.exists(summ)):
        pytest.skip("reference artifacts not present")
    analyses = load_results_jsonl(man)
    got = summarize(analyses, "fleurs_en_test")["categories"]
    want = json.load(open(summ))["fleurs_en_test"]["categories"]
    assert got == want
