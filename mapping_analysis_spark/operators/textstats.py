"""Text analysis for training-data pipelines — all native Columns.

* ``token_count`` / ``bpe_ish_token_count`` — whitespace tokens and a
  BPE-style regex segmentation count (GPT-2-ish word/number/punct pieces).
* ``quality_features`` / ``quality_score`` — length, punctuation ratio,
  stopword ratio, mean word length, digit ratio, uppercase ratio;
  a [0,1] quality heuristic combining them.
* ``language_id`` — n-gram-profile language heuristic over a handful of
  built-in profiles (broadcast literal maps; corpus-scale friendly).
* ``doc_fingerprint`` — 64-bit rolling-window content fingerprint
  (min of window hashes — winnowing-style; deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "as", "with", "was", "at", "by", "be", "this", "are",
    "from", "had", "have", "has", "not", "but", "were", "which", "you",
]

# token ratios of very common words per language (tiny built-in profiles;
# a real deployment swaps in fastText — kept dependency-free here)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "you", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "une"],
    "es": ["el", "la", "que", "los", "una", "es", "por", "con"],
    "pt": ["de", "que", "não", "uma", "os", "se", "da", "em"],
    "it": ["che", "di", "la", "il", "per", "una", "sono", "con"],
}


def tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != "")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-style pieces: runs of letters, runs of digits, single
    punctuation marks (a cheap, deterministic proxy for tokenizer load —
    the regex mirrors GPT-2's pre-tokenizer word classes)."""
    pieces = F.regexp_extract_all(
        col, F.lit(r"([A-Za-z]+|[0-9]+|[^\sA-Za-z0-9])"), 1
    )
    return F.size(pieces)


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    n_punct = n - F.length(F.regexp_replace(col, r"[\p{Punct}]", ""))
    return F.when(n > 0, n_punct.cast("double") / n).otherwise(0.0)


def digit_ratio(col: Column) -> Column:
    n = F.length(col)
    n_dig = n - F.length(F.regexp_replace(col, r"[0-9]", ""))
    return F.when(n > 0, n_dig.cast("double") / n).otherwise(0.0)


def upper_ratio(col: Column) -> Column:
    n = F.length(col)
    n_up = n - F.length(F.regexp_replace(col, r"[A-Z]", ""))
    return F.when(n > 0, n_up.cast("double") / n).otherwise(0.0)


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    stops = F.filter(toks, lambda w: w.isin(*_STOPWORDS))
    return F.when(F.size(toks) > 0, F.size(stops).cast("double") / F.size(toks)).otherwise(
        0.0
    )


def mean_word_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(0.0)


def quality_score(col: Column) -> Column:
    """[0,1] heuristic: rewards moderate length, sane word lengths, some
    stopwords; penalizes punctuation/digit/uppercase excess. Deterministic,
    monotone in each feature — a Gopher-rules-style filter."""
    n_tok = token_count(col).cast("double")
    len_ok = F.least(n_tok / 20.0, F.lit(1.0))
    wl = mean_word_len(col)
    wl_ok = F.when((wl >= 3.0) & (wl <= 10.0), 1.0).otherwise(0.5)
    stop_ok = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), 1.0 - punct_ratio(col) * 3.0)
    digit_pen = F.greatest(F.lit(0.0), 1.0 - digit_ratio(col) * 3.0)
    upper_pen = F.greatest(F.lit(0.0), 1.0 - upper_ratio(col) * 2.0)
    return F.round(
        len_ok * 0.25
        + wl_ok * 0.15
        + stop_ok * 0.2
        + punct_pen * 0.15
        + digit_pen * 0.15
        + upper_pen * 0.1,
        6,
    )


def language_id(col: Column) -> Column:
    """Best-scoring language by marker-token hit ratio; 'und' when nothing
    scores. Pure Column expression (the profiles are literals)."""
    toks = tokens(col)
    n = F.size(toks)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang, markers in _LANG_MARKERS.items():
        hits = F.size(F.filter(toks, lambda w: w.isin(*markers)))
        score = F.when(n > 0, hits.cast("double") / n).otherwise(0.0)
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def doc_fingerprint(col: Column, window: int = 8) -> Column:
    """64-bit content fingerprint: min over xxhash64 of every ``window``-
    gram of the normalized text (winnowing-style min-hash of character
    windows — stable under small local edits elsewhere in the document)."""
    norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    n = F.length(norm)
    idx = F.when(n >= window, F.sequence(F.lit(1), n - (window - 1))).otherwise(
        F.when(n > 0, F.array(F.lit(1))).otherwise(F.array().cast("array<int>"))
    )
    grams = F.transform(idx, lambda i: F.xxhash64(F.substring(norm, i, window)))
    return F.when(F.size(grams) > 0, F.array_min(grams))


def doc_fingerprint_md5(col: Column, window: int = 8) -> Column:
    """Same winnowing-style min-window fingerprint as ``doc_fingerprint``
    but with a 60-bit md5-derived gram hash instead of xxhash64 — md5 has
    an exact DuckDB twin (``('0x' || substr(md5(g), 1, 15))::BIGINT``), so
    this variant is fully oracle-checkable; production paths keep the
    cheaper xxhash64."""
    norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    n = F.length(norm)
    idx = F.when(n >= window, F.sequence(F.lit(1), n - (window - 1))).otherwise(
        F.when(n > 0, F.array(F.lit(1))).otherwise(F.array().cast("array<int>"))
    )
    grams = F.transform(
        idx,
        lambda i: F.conv(
            F.substring(F.md5(F.substring(norm, i, window)), 1, 15), 16, 10
        ).cast("long"),
    )
    return F.when(F.size(grams) > 0, F.array_min(grams))
