"""Byte-pair-encoding tokenizer training primitives.

The first stage of any LLM data pipeline that ships its own tokenizer:
count symbol pairs over the (word, frequency) table, merge the most
frequent pair, repeat.  The statistics pass is pure DataFrame algebra
— explode adjacent pairs weighted by word frequency, one
map-side-combinable shuffle — so each merge round costs ONE aggregation
over a relation whose size is the VOCABULARY (distinct words), not the
corpus: at 100 TB the corpus collapses to its word-frequency table
once, and every round after that is vocabulary-scale work.

The merge application is a per-word left-to-right greedy fold
(classic BPE non-overlapping semantics) in whole-stage codegen — no
Python in the loop; the driver only ever sees the (pair, count) argmax
row per round, never the corpus.

tests/test_bpe.py pins the trainer against a pure-Python reference
implementation; the pair-statistics pass is under the cross-engine
value-exact gate (workload/llm.py::bpe_pair_counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word marker (the classic Sennrich et al. convention — keeps
#: merges from crossing word boundaries and lets detokenization restore
#: spacing)
EOW = "</w>"


def word_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) frequency table — the ONE corpus-scale pass.  Words
    are the shared lowercased whitespace tokens (functions/text.py —
    one tokenizer everywhere, so a tweak there cannot desynchronize
    the BPE corpus statistics from the rest of the pipeline)."""
    from pg_analytics_spark.functions.text import tokens

    return (
        df.select(F.explode(tokens(F.lower(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """(word, n, syms) with syms = characters + the end-of-word marker."""
    return words.withColumn(
        "syms",
        F.expr(
            "concat(transform(sequence(1, length(word)), "
            f"i -> substring(word, i, 1)), array('{EOW}'))"
        ),
    )


def pair_counts(symbolized: DataFrame) -> DataFrame:
    """(a, b, cnt) adjacent-symbol pair frequencies, weighted by word
    frequency.  One explode + one hash-agg shuffle on (a, b); partial
    aggregation collapses each task to its distinct-pair set first.
    Single-symbol words (just the marker after full merging) emit no
    pairs."""
    return (
        symbolized.select(
            "n",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(element_at(syms, i) AS a, "
                    "element_at(syms, i + 1) AS b))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def _sq(s: str) -> str:
    """Spark SQL single-quote literal.  Backslashes must be doubled
    FIRST: Spark's parser applies C-style escapes inside string
    literals (default ``escapedStringLiterals=false``), so a corpus
    symbol like ``c:\\path`` would otherwise silently lose the
    backslash (or fail to parse when trailing) and diverge from the
    pure-Python merge reference."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def merge_pair_col(a: str, b: str) -> F.Column:
    """Left-to-right greedy application of merge (a, b) to `syms`:
    a fold that replaces the list's last element with a||b whenever
    (last, current) == (a, b) — after a replacement the merged symbol
    is the new last, so overlapping occurrences ('a a a' under (a,a))
    correctly merge non-overlapping ([aa, a]), the standard BPE rule.
    """
    lit_a, lit_b, lit_ab = _sq(a), _sq(b), _sq(a + b)
    return F.expr(
        "aggregate(syms, cast(array() AS array<string>), (acc, s) -> "
        f"IF(size(acc) > 0 AND element_at(acc, -1) = {lit_a} AND s = {lit_b}, "
        f"concat(slice(acc, 1, size(acc) - 1), array({lit_ab})), "
        "concat(acc, array(s))))"
    )


def train_bpe(
    df: DataFrame, text_col: str, n_merges: int = 10
) -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE merges; returns [(a, b, count), …] in merge
    order.  Argmax tie rule: highest count, then lexicographic (a, b)
    — deterministic for a fixed corpus.

    Per round: one vocabulary-scale aggregation (pair_counts) + a
    1-row collect; the merge rewrite is a codegen fold.  The word
    table persists across rounds (vocabulary-sized, released at the
    end); localCheckpoint every 8 rounds truncates the growing fold
    lineage the same way dedup's label propagation does.
    """
    words = initial_symbols(word_table(df, text_col)).select("n", "syms")
    words = words.persist()
    prev = None
    merges: list[tuple[str, str, int]] = []
    try:
        for r in range(n_merges):
            top = (
                pair_counts(words)
                .orderBy(F.desc("cnt"), "a", "b")
                .limit(1)
                .collect()
            )
            # the collect above MATERIALIZED words' cache — only now is
            # the previous round's cache safe to drop (unpersisting it
            # before any action on the child would force the next
            # round to recompute the whole fold chain from scratch)
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top or top[0]["cnt"] <= 0:
                break
            a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
            merges.append((a, b, cnt))
            nxt = words.withColumn("syms", merge_pair_col(a, b))
            if (r + 1) % 8 == 0:
                nxt = nxt.localCheckpoint(eager=True)
            prev, words = words, nxt.persist()
    finally:
        words.unpersist()
        if prev is not None:
            prev.unpersist()
    return merges


def bpe_segment(
    df: DataFrame, word_col: str, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """df + `bpe_toks` column: the word segmented by the merge list."""
    expr = (
        f"concat(transform(sequence(1, length({word_col})), "
        f"i -> substring({word_col}, i, 1)), array('{EOW}'))"
    )
    for a, b, _ in merges:
        lit_a, lit_b, lit_ab = _sq(a), _sq(b), _sq(a + b)
        expr = (
            f"aggregate({expr}, cast(array() AS array<string>), (acc, s) -> "
            f"IF(size(acc) > 0 AND element_at(acc, -1) = {lit_a} AND s = {lit_b}, "
            f"concat(slice(acc, 1, size(acc) - 1), array({lit_ab})), "
            "concat(acc, array(s))))"
        )
    return df.withColumn("bpe_toks", F.expr(expr))


def replace_chain_sql(col_sql: str, merges: list[tuple[str, str]]) -> str:
    """SQL expression applying `merges` to one WORD as a chain of plain
    string replaces — the cross-engine-portable encode path.

    The word is exploded to space-flanked symbols (`' c1 c2 … </w> '`),
    then each merge (a, b) rewrites `' a b '` → `' ab '`.  A plain
    replace scans left-to-right over NON-overlapping matches, and a
    match consumes b's trailing space, so of a CONSECUTIVE run of
    occurrences only every other one rewrites per pass — each merge is
    therefore applied TWICE (any alternating leftover re-gains its
    flanking spaces after pass one; natural-language words have no
    runs deeper than two).  These semantics are deliberately chosen
    over the exact greedy fold (merge_pair_col) because they are
    expressible IDENTICALLY in Spark and DuckDB (`replace` has the
    same non-overlapping scan in both), keeping corpus encode under
    the bit-exact cross-engine gate; on run-free words the result
    equals the greedy fold (tests/test_bpe.py pins both facts).

    Everything stays in whole-stage codegen (StringReplace) — no
    interpreted HOF fold on the per-word path; at corpus scale the
    chain should run over the DISTINCT-word relation and join back
    (see workload/llm.py::bpe_encode_corpus).
    """
    expr = f"concat(' ', regexp_replace({col_sql}, '(.)', '$1 '), '{EOW} ')"
    for a, b in merges:
        pat, rep = _sq(f" {a} {b} "), _sq(f" {a}{b} ")
        expr = f"replace(replace({expr}, {pat}, {rep}), {pat}, {rep})"
    return expr


def replace_chain_duckdb_sql(
    col_sql: str, merges: list[tuple[str, str]]
) -> str:
    """The oracle twin of replace_chain_sql — same chain, DuckDB
    spellings (`\\1` backreference + explicit 'g' flag; DuckDB string
    literals take no C-escapes, so only quotes double)."""

    def dq(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    expr = (
        f"' ' || regexp_replace({col_sql}, '(.)', '\\1 ', 'g') || '{EOW} '"
    )
    for a, b in merges:
        pat, rep = dq(f" {a} {b} "), dq(f" {a}{b} ")
        expr = f"replace(replace({expr}, {pat}, {rep}), {pat}, {rep})"
    return expr
