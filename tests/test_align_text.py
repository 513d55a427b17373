"""Parity tests for alignment math and text merging vs HF implementations."""

import numpy as np
import pytest

from thewhisper_tpu.align import dtw_path, median_filter, token_timestamps_from_alignment
from thewhisper_tpu.text import combine_tokens_into_words, find_longest_common_sequence


def test_median_filter_matches_hf():
    import torch
    from transformers.models.whisper.generation_whisper import _median_filter

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 40)).astype(np.float32)
    for width in (3, 5, 7):
        ref = _median_filter(torch.from_numpy(x), width).numpy()
        ours = median_filter(x, width)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_median_filter_short_inputs_match_hf():
    """HF skips only when T <= width//2; width//2 < T < width IS filtered
    (a round-2 review found the old 'T < width -> identity' shortcut)."""
    import torch
    from transformers.models.whisper.generation_whisper import _median_filter

    rng = np.random.default_rng(1)
    for t in range(1, 10):
        x = rng.standard_normal((2, 3, t)).astype(np.float32)
        ref = _median_filter(torch.from_numpy(x), 7).numpy()
        np.testing.assert_allclose(median_filter(x, 7), ref, atol=1e-6,
                                   err_msg=f"T={t}")
        np.testing.assert_array_equal(median_filter(x, 1), x)


def test_dtw_tie_inputs_match_hf():
    """Quantized (tie-heavy) cost matrices: HF's strict-< cascade falls
    through to LEFT on ties; both our implementations must replicate it
    (round-2 review finding)."""
    from transformers.models.whisper.generation_whisper import (
        _dynamic_time_warping,
    )

    from thewhisper_tpu.align import dtw_path
    from thewhisper_tpu.native_lib import dtw_path_native

    rng = np.random.default_rng(7)
    for _ in range(20):
        s, t = int(rng.integers(2, 10)), int(rng.integers(2, 16))
        m = np.round(rng.standard_normal((s, t)) * 2) / 2
        ref_ti, ref_tj = _dynamic_time_warping(m)
        ours = dtw_path(m)
        np.testing.assert_array_equal(ours[0], ref_ti)
        np.testing.assert_array_equal(ours[1], ref_tj)
        nat = dtw_path_native(m)
        if nat is not None:
            np.testing.assert_array_equal(nat[0], ref_ti)
            np.testing.assert_array_equal(nat[1], ref_tj)


def test_lcs_merge_handles_open_right_end():
    """The last kept token of a window carries (t0, None); an equal start
    across windows must not compare float <= None (round-2 review)."""
    from thewhisper_tpu.text import find_longest_common_sequence

    seqs = [[1, 2, 3, 4], [3, 4, 5, 6]]
    ts = [
        [(0.0, 0.5), (0.5, 1.0), (1.0, 1.2), (1.2, None)],
        [(1.0, 1.2), (1.2, 1.5), (1.5, 1.8), (1.8, None)],
    ]
    tokens, merged_ts = find_longest_common_sequence(seqs, ts)
    assert tokens == [1, 2, 3, 4, 5, 6]
    assert len(merged_ts) == 6


def test_dtw_matches_hf():
    from transformers.models.whisper.generation_whisper import _dynamic_time_warping

    rng = np.random.default_rng(2)
    for s, t in [(5, 9), (20, 50), (1, 10), (13, 13)]:
        m = rng.standard_normal((s, t))
        ref_text, ref_time = _dynamic_time_warping(-m)
        our_text, our_time = dtw_path(-m)
        np.testing.assert_array_equal(our_text, ref_text)
        np.testing.assert_array_equal(our_time, ref_time)


def test_token_timestamps_monotonic():
    # Synthetic diagonal attention: token i attends around frame 4*i.
    s_rows, t_enc, a = 10, 60, 2
    align = np.zeros((1, a, s_rows, t_enc), np.float32)
    for i in range(s_rows):
        center = 4 * i + 2
        for dt in range(-2, 3):
            j = np.clip(center + dt, 0, t_enc - 1)
            align[0, :, i, j] += 1.0 - 0.3 * abs(dt)
    ts = token_timestamps_from_alignment(align, np.array([s_rows]), num_frames=2 * t_enc)
    diffs = np.diff(ts[0])
    assert (diffs >= 0).all()
    assert ts[0, -1] <= t_enc * 0.02 + 1e-6


class DummyTokenizer:
    """Duck-typed tokenizer shared by our and HF word-combining code."""

    def __init__(self, table):
        self.table = table
        self.eos_token_id = 90
        self.language = "english"

    def decode(self, ids, decode_with_timestamps=False, skip_special_tokens=False):
        return "".join(self.table.get(int(i), "") for i in ids)


TABLE = {
    1: " Hello", 2: ",", 3: " wor", 4: "ld", 5: "!", 6: " open", 7: "ing",
    8: " (", 9: "quote", 10: ")", 11: " é", 12: "té",  # " été" pieces
    13: " -", 14: "dash",
}


def test_combine_tokens_into_words_matches_hf():
    from transformers.models.whisper.tokenization_whisper import (
        _combine_tokens_into_words,
    )

    tok = DummyTokenizer(TABLE)
    cases = [
        [1, 2, 3, 4, 5],
        [6, 7, 3, 4],
        [1, 8, 9, 10],
        [11, 12, 1],
        [13, 14, 1],
    ]
    for ids in cases:
        ref_words, ref_tokens, ref_idx = _combine_tokens_into_words(tok, list(ids))
        words, word_tokens, idx = combine_tokens_into_words(
            lambda t: tok.decode(t), list(ids), language="english", special_id=90)
        assert words == ref_words, ids
        assert word_tokens == ref_tokens
        assert idx == ref_idx


def test_lcs_merge_matches_hf_plain():
    from transformers.models.whisper.tokenization_whisper import (
        _find_longest_common_sequence,
    )

    seqs = [
        [1, 2, 3, 4, 5, 6, 7],
        [5, 6, 7, 8, 9, 10],
        [9, 10, 11, 12],
    ]
    ref = _find_longest_common_sequence(seqs)
    ours = find_longest_common_sequence(seqs)
    assert ours == list(ref)


def test_lcs_merge_matches_hf_with_timestamps():
    from transformers.models.whisper.tokenization_whisper import (
        _find_longest_common_sequence,
    )

    seqs = [
        [1, 2, 3, 4, 5, 6],
        [4, 5, 6, 7, 8],
    ]
    ts = [
        [(0.0, 0.5), (0.5, 1.0), (1.0, 1.5), (1.5, 2.0), (2.0, 2.5), (2.5, None)],
        [(1.4, 2.0), (2.0, 2.6), (2.6, 3.0), (3.0, 3.4), (3.4, None)],
    ]
    ref_tokens, ref_ts = _find_longest_common_sequence(seqs, ts)
    our_tokens, our_ts = find_longest_common_sequence(seqs, ts)
    assert our_tokens == list(ref_tokens)
    assert our_ts == list(ref_ts)


def test_lcs_merge_rejects_out_of_order_timestamps():
    # Same token ids but wildly inconsistent timestamps on the right: the
    # timestamp-aware matcher should not count those matches.
    seqs = [[1, 2, 3], [2, 3, 4]]
    good_ts = [[(0, 1), (1, 2), (2, 3)], [(1, 2), (2, 3), (3, 4)]]
    merged, merged_ts = find_longest_common_sequence(seqs, good_ts)
    assert merged == [1, 2, 3, 4]

    bad_ts = [[(5, 6), (6, 7), (7, 8)], [(0, 1), (1, 2), (2, 3)]]
    merged_bad, _ = find_longest_common_sequence(seqs, bad_ts)
    # Without valid matches the sequences are concatenated at the fallback
    # split rather than overlapped.
    assert len(merged_bad) >= 4


def test_median_filter_network_matches_np_median():
    """The width-7 selection network and odd-width partition paths must
    equal np.median over the reflect-padded window exactly, for every
    width class (network / partition / even fallback / skip)."""
    rng = np.random.default_rng(3)
    from thewhisper_tpu.align import median_filter

    for shape in [(450,), (3, 36, 450), (2, 5), (1, 7), (4,)]:
        x = rng.standard_normal(shape).astype(np.float32)
        for width in (1, 2, 3, 4, 5, 7, 9):
            got = median_filter(x, width)
            if width <= 1 or x.shape[-1] <= width // 2:
                np.testing.assert_array_equal(got, x)
                continue
            half = width // 2
            padded = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, half)],
                            mode="reflect")
            win = np.lib.stride_tricks.sliding_window_view(
                padded, width, axis=-1)
            np.testing.assert_allclose(got, np.median(win, axis=-1),
                                       err_msg=f"{shape} w={width}")
