"""Stop-name normalization (reference: src/pdf2gtfs/utils.py:51-156).

Pipeline: lower+casefold -> abbreviation expansion (dot-aware regex) ->
strip parentheses + non-allowed chars -> per-'|'-name word-set sort &
dedup.

``normalize_series`` is the exact pandas implementation (kernel/tests);
``normalize_col`` is the Spark Column version using only built-in
functions so it stays inside whole-stage codegen.
"""

from __future__ import annotations

import re
from typing import Mapping, Sequence

import pandas as pd

from pdf2gtfs_spark.config import DEFAULT_CONFIG, ExtractConfig

# Latin-1 letter ranges the reference treats as allowed word chars
# (utils.py:51 SPECIAL_CHARS).
SPECIAL_CHARS = "À-ÖØ-öø-ÿ"


def get_abbreviations_regex(abbrevs: Mapping[str, str]) -> str:
    """reference: utils.py:63-84."""
    def _to_regex(abbrev_key: str) -> str:
        ends_with_key_regex = ""
        if abbrev_key.endswith("."):
            abbrev_key = re.escape(abbrev_key[:-1])
            ends_with_key_regex = rf"|({abbrev_key}\.)"
        abbrev_key = re.escape(abbrev_key)
        key_matches_word_regex = rf"(\b{abbrev_key}\.)|(\b{abbrev_key}\b)"
        return key_matches_word_regex + ends_with_key_regex

    return "|".join(map(_to_regex, abbrevs))


def replace_abbreviations(name: str,
                          abbrevs: Mapping[str, str] | None = None) -> str:
    """reference: utils.py:57-95."""
    abbrevs = abbrevs if abbrevs is not None else dict(
        DEFAULT_CONFIG.name_abbreviations)
    regex = get_abbreviations_regex(abbrevs)
    if not regex:
        return name

    def _repl(match: re.Match) -> str:
        key = match.group(0).replace(".", "").lower()
        if key not in abbrevs:
            return abbrevs[key + "."]
        return abbrevs[key]

    return re.sub(regex, _repl, name)


def _forbidden_chars_regex(allowed_stop_chars: Sequence[str]) -> str:
    parentheses_re = r"(\(.*\))"
    allowed = "".join(allowed_stop_chars)
    char_re = fr"([^a-zA-Z\d\|{SPECIAL_CHARS}{allowed}])"
    return "|".join([parentheses_re, char_re])


def normalize_series(raw: pd.Series,
                     cfg: ExtractConfig = DEFAULT_CONFIG) -> pd.Series:
    """Exact port of the reference normalize_series (utils.py:98-150)."""
    abbrevs = dict(cfg.name_abbreviations)
    regex = get_abbreviations_regex(abbrevs)

    def _repl(match: re.Match) -> str:
        key = match.group(0).replace(".", "").lower()
        return abbrevs[key] if key in abbrevs else abbrevs[key + "."]

    s = raw.str.lower().str.casefold()
    if regex:
        s = s.str.replace(regex, _repl, regex=True)
    s = s.str.replace(_forbidden_chars_regex(cfg.allowed_stop_chars), " ",
                      regex=True)

    def _sort_names(value: str) -> str:
        names = []
        for name in value.split("|"):
            words = {w.strip() for w in name.split(" ") if w.strip()}
            names.append(" ".join(sorted(words)))
        return "|".join(names)

    return s.map(_sort_names)


def normalize_name(name: str, cfg: ExtractConfig = DEFAULT_CONFIG) -> str:
    """Single-string wrapper (reference: utils.py:153-156)."""
    return normalize_series(pd.Series([name]), cfg).iloc[0]


def normalize_col(col, cfg: ExtractConfig = DEFAULT_CONFIG):
    """Spark Column expression equivalent of normalize_series.

    Built-ins only (lower/regexp_replace/split/filter/array_sort/
    array_distinct/transform/array_join) so Catalyst keeps it inside
    WholeStageCodegen. casefold is approximated by the explicit German
    sharp-s mapping the golden tests require (utils.py:101-103).
    """
    from pyspark.sql import functions as F

    abbrevs = dict(cfg.name_abbreviations)
    expr = F.lower(col)
    expr = F.regexp_replace(expr, "ß", "ss")
    # chained per-key replacement; equivalent to the reference's single
    # alternation for non-overlapping default keys
    for key, full in abbrevs.items():
        if key.endswith("."):
            base = re.escape(key[:-1])
            pat = rf"(\b{base}\.)|(\b{base}\b)|({base}\.)"
        else:
            base = re.escape(key)
            pat = rf"(\b{base}\.)|(\b{base}\b)"
        expr = F.regexp_replace(expr, pat, full)
    expr = F.regexp_replace(
        expr, _forbidden_chars_regex(cfg.allowed_stop_chars), " ")
    per_name = F.transform(
        F.split(expr, r"\|"),
        lambda p: F.array_join(
            F.array_sort(F.array_distinct(
                F.filter(F.split(F.trim(p), " +"), lambda w: w != ""))),
            " "))
    return F.array_join(per_name, "|")
