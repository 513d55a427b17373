"""Whisper-style text normalizers for WER evaluation.

The eval protocol pins the Open-ASR-Leaderboard normalization
(``benchmark/eval_utils.py:24-35``; vendored ``ml_normalizer.py``): English
text goes through the Whisper ``EnglishTextNormalizer``, other languages
through ``BasicTextNormalizer``. These are re-implemented here without the
``whisper_normalizer`` package:

- ``BasicTextNormalizer`` reproduces the reference behavior: strip
  bracketed asides, lowercase, map every Unicode Mark/Symbol/Punctuation
  codepoint to a space (or split-letters mode), collapse whitespace.
- ``EnglishTextNormalizer`` implements the same pipeline shape —
  bracket/filler removal, contraction expansion, British->American
  spelling mapping, number-word handling, punctuation and whitespace
  rules. The spelling table is a curated subset of the leaderboard's
  ~2k-entry json; the number normalizer covers cardinal compositions up
  to the billions, ordinals, and currency/percent suffixes. Differences
  from the full normalizer only matter for exotic spellings, and affect
  reference and hypothesis symmetrically.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterable, List

_ADDITIONAL_DIACRITICS = {
    "œ": "oe", "Œ": "OE", "ø": "o", "Ø": "O", "æ": "ae", "Æ": "AE",
    "ß": "ss", "ẞ": "SS", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "th", "ł": "l", "Ł": "L",
}


def _remove_symbols_and_diacritics(s: str, keep: str = "") -> str:
    out = []
    for c in unicodedata.normalize("NFKD", s):
        if c in keep:
            out.append(c)
        elif c in _ADDITIONAL_DIACRITICS:
            out.append(_ADDITIONAL_DIACRITICS[c])
        elif unicodedata.category(c) == "Mn":
            continue
        elif unicodedata.category(c)[0] in "MSP":
            out.append(" ")
        else:
            out.append(c)
    return "".join(out)


def _remove_symbols(s: str) -> str:
    return "".join(
        " " if unicodedata.category(c)[0] in "MSP" else c
        for c in unicodedata.normalize("NFKC", s))


class BasicTextNormalizer:
    """Language-agnostic normalizer (non-English eval)."""

    def __init__(self, remove_diacritics: bool = False,
                 split_letters: bool = False):
        self.clean = (_remove_symbols_and_diacritics if remove_diacritics
                      else _remove_symbols)
        self.split_letters = split_letters

    def __call__(self, s: str) -> str:
        s = s.lower()
        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)   # words between brackets
        s = re.sub(r"\(([^)]+?)\)", "", s)        # words between parens
        s = self.clean(s).lower()
        if self.split_letters:
            s = " ".join(re.findall(r"\X", s, re.U))
        s = re.sub(r"\s+", " ", s)
        return s.strip()


_CONTRACTIONS = {
    "won't": "will not", "can't": "can not", "shan't": "shall not",
    "let's": "let us", "ain't": "aint",
    "'cause": "because", "y'all": "you all", "ma'am": "madam",
    "o'clock": "oclock", "o'er": "over", "ne'er": "never",
}
_SUFFIX_CONTRACTIONS = [
    (r"n't\b", " not"), (r"'re\b", " are"), (r"'ve\b", " have"),
    (r"'ll\b", " will"), (r"'d\b", " would"), (r"'m\b", " am"),
]

# Curated subset of the leaderboard British->American table.
_SPELLINGS = {
    "colour": "color", "colours": "colors", "favour": "favor",
    "favours": "favors", "favourite": "favorite", "favourites": "favorites",
    "flavour": "flavor", "flavours": "flavors", "honour": "honor",
    "honours": "honors", "humour": "humor", "labour": "labor",
    "labours": "labors", "neighbour": "neighbor", "neighbours": "neighbors",
    "behaviour": "behavior", "behaviours": "behaviors",
    "organise": "organize", "organised": "organized",
    "organisation": "organization", "organisations": "organizations",
    "realise": "realize", "realised": "realized", "recognise": "recognize",
    "recognised": "recognized", "analyse": "analyze", "analysed": "analyzed",
    "centre": "center", "centres": "centers", "metre": "meter",
    "metres": "meters", "theatre": "theater", "theatres": "theaters",
    "litre": "liter", "litres": "liters", "fibre": "fiber",
    "defence": "defense", "offence": "offense", "licence": "license",
    "practise": "practice", "practised": "practiced",
    "travelling": "traveling", "travelled": "traveled",
    "cancelled": "canceled", "cancelling": "canceling",
    "modelling": "modeling", "modelled": "modeled",
    "programme": "program", "programmes": "programs",
    "grey": "gray", "greys": "grays", "tyre": "tire", "tyres": "tires",
    "aluminium": "aluminum", "aeroplane": "airplane", "cheque": "check",
    "cheques": "checks", "catalogue": "catalog", "catalogues": "catalogs",
    "dialogue": "dialog", "dialogues": "dialogs", "jewellery": "jewelry",
    "mum": "mom", "mums": "moms", "storey": "story", "storeys": "stories",
    "whilst": "while", "amongst": "among", "learnt": "learned",
    "burnt": "burned", "dreamt": "dreamed", "spelt": "spelled",
    "enrol": "enroll", "fulfil": "fulfill", "skilful": "skillful",
}

_ONES = {
    "zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
    "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11,
    "twelve": 12, "thirteen": 13, "fourteen": 14, "fifteen": 15,
    "sixteen": 16, "seventeen": 17, "eighteen": 18, "nineteen": 19,
}
_TENS = {
    "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50, "sixty": 60,
    "seventy": 70, "eighty": 80, "ninety": 90,
}
_MULTIPLIERS = {
    "hundred": 100, "thousand": 1000, "million": 10 ** 6,
    "billion": 10 ** 9, "trillion": 10 ** 12,
}
_ORDINALS = {
    "first": 1, "second": 2, "third": 3, "fourth": 4, "fifth": 5,
    "sixth": 6, "seventh": 7, "eighth": 8, "ninth": 9, "tenth": 10,
    "eleventh": 11, "twelfth": 12, "twentieth": 20, "thirtieth": 30,
    "fortieth": 40, "fiftieth": 50, "sixtieth": 60, "seventieth": 70,
    "eightieth": 80, "ninetieth": 90, "hundredth": 100, "thousandth": 1000,
}


def _normalize_numbers(words: List[str]) -> List[str]:
    """Collapse number-word runs into digits ("twenty two" -> "22",
    "three point one four" -> "3.14")."""
    out: List[str] = []
    i = 0
    while i < len(words):
        w = words[i]
        # Decimal tails: <number> point <digit words...>
        if (w == "point" and out and out[-1].isdigit()
                and i + 1 < len(words) and words[i + 1] in _ONES
                and _ONES[words[i + 1]] <= 9):
            digits = []
            j = i + 1
            while j < len(words) and words[j] in _ONES and _ONES[words[j]] <= 9:
                digits.append(str(_ONES[words[j]]))
                j += 1
            out[-1] = out[-1] + "." + "".join(digits)
            i = j
            continue
        if w in _ONES or w in _TENS:
            value = 0
            current = 0
            consumed = 0
            j = i
            valid = False
            while j < len(words):
                t = words[j]
                if t in _ONES:
                    if current % 10 or (current % 100 and _ONES[t] >= 10):
                        break
                    current += _ONES[t]
                    valid = True
                elif t in _TENS:
                    if current % 100:
                        break
                    current += _TENS[t]
                    valid = True
                elif t == "and" and valid and j + 1 < len(words) and (
                        words[j + 1] in _ONES or words[j + 1] in _TENS):
                    j += 1
                    continue
                elif t in _MULTIPLIERS:
                    mult = _MULTIPLIERS[t]
                    if mult == 100:
                        current = max(current, 1) * 100
                    else:
                        value += max(current, 1) * mult
                        current = 0
                    valid = True
                else:
                    break
                j += 1
                consumed = j - i
            if valid and consumed >= 1:
                out.append(str(value + current))
                i += consumed
                continue
        if w in _ORDINALS:
            n = _ORDINALS[w]
            suffix = {1: "st", 2: "nd", 3: "rd"}.get(n % 10 if n % 100 not in
                                                     (11, 12, 13) else 0, "th")
            out.append(f"{n}{suffix}")
            i += 1
            continue
        out.append(w)
        i += 1
    return out


class EnglishTextNormalizer:
    """English eval normalizer (Open-ASR-Leaderboard protocol shape)."""

    _FILLERS = r"\b(hmm+|mm+|mhm+|mmm+|uh+|um+)\b"

    def __call__(self, s: str) -> str:
        s = s.lower()
        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)
        s = re.sub(r"\(([^)]+?)\)", "", s)
        s = re.sub(self._FILLERS, "", s)
        s = re.sub(r"\s+'", "'", s)               # standalone apostrophes

        # Irregular contractions first, then the generic suffix rules.
        for src, dst in _CONTRACTIONS.items():
            s = s.replace(src, dst)
        for pat, rep in _SUFFIX_CONTRACTIONS:
            s = re.sub(pat, rep, s)
        s = re.sub(r"(\w)'s\b", r"\1s", s)        # possessives/is -> bare s

        # Keep digits, %, $, and decimal points inside numbers.
        s = re.sub(r"[^\w\s%$.,]", " ", s)
        s = re.sub(r"(?<!\d)[.,](?!\d)", " ", s)  # punctuation not in numbers
        s = re.sub(r"[.,]$", "", s)

        words = s.split()
        words = [_SPELLINGS.get(w, w) for w in words]
        words = _normalize_numbers(words)
        s = " ".join(words)

        s = re.sub(r"\$(\d+)", r"\1 dollars", s)
        s = re.sub(r"(\d+)%", r"\1 percent", s)
        s = re.sub(r"\s+", " ", s)
        return s.strip()
