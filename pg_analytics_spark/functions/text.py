"""Text-analysis column functions: tokenization, shingles, quality,
language-ID, fingerprinting.

Design constraints:
* Built-in `pyspark.sql.functions` only — everything stays in
  whole-stage codegen (UDFs are the slow path at 100 TB).
* Every regex used here behaves identically in Java regex (Spark) and
  RE2 (DuckDB) so the oracle can mirror the computation: only
  ``\\s``/literal classes, no lookaround, no backrefs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword marker lists for the n-gram/wordlist
#: language heuristic.  Deliberately small and ASCII-safe: the point is
#: a deterministic, cross-engine-reproducible scoring rule.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "une"],
    "es": ["el", "la", "los", "y", "es", "en", "que", "por"],
    "zh": ["de", "shi", "bu", "le", "wo", "ni", "ta", "men"],
}

#: shared stopword list for the quality heuristic (English-ish).
STOPWORDS = LANG_MARKERS["en"] + ["a", "an", "it", "on", "for", "as", "at", "by"]

_PUNCT_CLASS = "[.,!?;:]"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize(col) -> Column:
    """Lowercase + collapse whitespace — the canonical form used by
    fingerprints and shingles."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def tokens(col) -> Column:
    """Whitespace tokenization (empty tokens dropped)."""
    return F.filter(F.split(_c(col), r"\s+"), lambda t: t != "")


def token_count(col) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col) -> Column:
    """BPE-ish token counting: alphabetic runs, digit runs, and single
    non-space symbols each count as one token."""
    return F.size(
        F.regexp_extract_all(F.lower(_c(col)), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    )


def char_shingles(col, k: int = 5) -> Column:
    """Distinct character k-gram shingle set of the normalized text.

    Texts shorter than k yield an empty set — guarded explicitly because
    Spark's sequence(0, negative) would step *descending* instead of
    producing an empty array.

    The normalized text is bound ONCE as a lambda variable (computed
    value) before the per-index substring transform.  Referencing the
    normalize() expression directly inside the lambda would make
    Catalyst re-evaluate the regexp_replace for EVERY shingle (~len(t)
    times per row — measured 15s for 5k docs vs <1s bound).
    """

    def _one(t: Column) -> Column:
        idx = F.when(
            F.length(t) >= k, F.sequence(F.lit(0), F.length(t) - k)
        ).otherwise(F.array().cast("array<int>"))
        return F.array_distinct(
            F.transform(idx, lambda i: F.substring(t, F.lit(1) + i, F.lit(k)))
        )

    return F.element_at(F.transform(F.array(normalize(col)), _one), 1)


def punct_ratio(col) -> Column:
    """Punctuation chars / total chars (0 for empty strings)."""
    t = _c(col)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, _PUNCT_CLASS, ""))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        n_punct.cast("double") / F.length(t).cast("double")
    )


def _in_list(token: Column, words: list[str]) -> Column:
    # Column.isin() is unsupported on higher-order-function lambda
    # variables; array_contains over a literal array is equivalent.
    return F.array_contains(F.array(*[F.lit(w) for w in words]), token)


def stopword_ratio(col) -> Column:
    """Stopword tokens / total tokens (duplicates counted)."""
    toks = tokens(F.lower(_c(col)))
    n_stop = F.size(F.filter(toks, lambda t: _in_list(t, STOPWORDS)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        n_stop.cast("double") / F.size(toks).cast("double")
    )


def quality_score(col) -> Column:
    """Composite quality heuristic in [0,1]: rewards mid-length docs,
    penalizes punctuation soup and stopword-free keyword stuffing.
    Deterministic rational arithmetic (int/int double divisions) so the
    oracle reproduces it exactly."""
    n_tok = token_count(col).cast("double")
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop = stopword_ratio(col)
    stop_term = F.least(stop * F.lit(4.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * F.lit(4.0), F.lit(1.0))
    return (length_term + stop_term + punct_term) / F.lit(3.0)


def lang_scores(col) -> dict[str, Column]:
    """Marker-token hit count per language (duplicates counted)."""
    toks = tokens(F.lower(_c(col)))
    def _counter(markers: list[str]):
        # NB: not `lambda t, m=markers: ...` — a second parameter (even
        # defaulted) makes PySpark treat it as the (value, index) form.
        return lambda t: _in_list(t, markers)

    return {
        lang: F.size(F.filter(toks, _counter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col) -> Column:
    """Predicted language: argmax marker score, first-listed wins ties
    (fixed comparison order → deterministic, oracle-reproducible)."""
    scores = lang_scores(col)
    langs = list(LANG_MARKERS)
    expr = F.lit(langs[-1])
    # fold right-to-left so earlier languages win ties with strict >
    for lang in reversed(langs[:-1]):
        later = [scores[lo] for lo in langs[langs.index(lang) + 1 :]]
        best_later = later[0]
        for c in later[1:]:
            best_later = F.greatest(best_later, c)
        expr = F.when(scores[lang] >= best_later, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col) -> Column:
    """Document fingerprint: md5 of the normalized text — identical hex
    in Spark and DuckDB, so exact-dedup keys transfer across engines."""
    return F.md5(normalize(col).cast("binary"))
