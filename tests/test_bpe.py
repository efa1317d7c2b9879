"""BPE trainer (operators/bpe.py) pinned against a pure-Python
reference implementation — merge-for-merge, count-for-count — plus the
segmenter's structural invariants.  The round-0 statistics pass is
additionally under the cross-engine value gate (bpe_pair_counts)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from pg_analytics_spark.operators.bpe import (
    EOW,
    bpe_segment,
    train_bpe,
    word_table,
)
from tests.conftest import SF_DIR


def _python_bpe(texts: list[str], n_merges: int):
    """Reference BPE (Sennrich-style greedy left-to-right merges),
    deliberately naive."""
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                words[w] += 1
    vocab = {w: [*w, EOW] for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        if not pairs:
            break
        # argmax: count desc, then lexicographic (a, b)
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_train_bpe_matches_python_reference(spark, docs):
    texts = [r["text"] for r in docs.select("text").collect()]
    expect = _python_bpe(texts, 10)
    got = train_bpe(docs, "text", n_merges=10)
    assert got == expect


def test_bpe_segment_roundtrip_and_compression(spark, docs):
    """Segmenting with learned merges must (1) re-concatenate to the
    original word + EOW, (2) never produce more symbols than
    characters+1, and (3) actually compress the corpus (fewer total
    symbols than round 0)."""
    merges = train_bpe(docs, "text", n_merges=10)
    words = word_table(docs, "text")
    seg = bpe_segment(words, "word", merges)
    stats = seg.selectExpr(
        "sum(CASE WHEN array_join(bpe_toks, '') = word || '</w>' "
        "THEN 0 ELSE 1 END) AS bad_roundtrip",
        "sum(CASE WHEN size(bpe_toks) > length(word) + 1 "
        "THEN 1 ELSE 0 END) AS grew",
        "sum(size(bpe_toks) * n) AS total_syms",
        "sum((length(word) + 1) * n) AS total_chars",
    ).collect()[0]
    assert stats["bad_roundtrip"] == 0
    assert stats["grew"] == 0
    assert stats["total_syms"] < stats["total_chars"]


def test_bpe_merge_handles_overlapping_runs(spark):
    """'a a a' under merge (a, a) → [aa, a] — left-to-right
    non-overlapping, the classic BPE rule."""
    df = spark.createDataFrame([("aaa",), ("aaaa",)], "word string")
    seg = bpe_segment(df, "word", [("a", "a", 0)])
    got = {r["word"]: r["bpe_toks"] for r in seg.collect()}
    assert got["aaa"] == ["aa", "a", EOW]
    assert got["aaaa"] == ["aa", "aa", EOW]


def test_bpe_symbols_with_backslashes(spark):
    """Merged symbols ride inside Spark SQL string literals where the
    parser applies C-style backslash escapes — a corpus token like
    'c:\\x' must merge identically to the pure-Python rule (and a
    trailing backslash must not break the literal)."""
    df = spark.createDataFrame([("c:\\x",), ("y\\",)], "word string")
    seg = bpe_segment(df, "word", [("\\", "x", 0)])
    got = {r["word"]: r["bpe_toks"] for r in seg.collect()}
    assert got["c:\\x"] == ["c", ":", "\\x", EOW]
    assert got["y\\"] == ["y", "\\", EOW]
    # merge producing a symbol that ENDS in a backslash also parses
    seg2 = bpe_segment(df, "word", [("y", "\\", 0)])
    got2 = {r["word"]: r["bpe_toks"] for r in seg2.collect()}
    assert got2["y\\"] == ["y\\", EOW]


class TestReplaceChain:
    """replace_chain_sql: the portable (cross-engine bit-exact) encode
    path — double-pass plain-replace semantics."""

    @staticmethod
    def _python_chain(word: str, merges) -> list[str]:
        s = " " + "".join(c + " " for c in word) + EOW + " "
        for a, b in merges:
            pat, rep = f" {a} {b} ", f" {a}{b} "
            s = s.replace(pat, rep).replace(pat, rep)
        return s.split()

    def test_chain_matches_python_reference(self, spark):
        from pg_analytics_spark.operators.bpe import replace_chain_sql

        merges = [("t", "h"), ("th", "e"), ("e", EOW), ("o", "n"),
                  ("on", "on")]
        words = ["the", "theatre", "ononon", "onononon", "x", "don't",
                 "100%", "thethe"]
        df = spark.createDataFrame([(w,) for w in words], "word string")
        got = {
            r["word"]: r["toks"]
            for r in df.select(
                "word",
                F.expr(
                    "split(trim("
                    + replace_chain_sql("word", merges)
                    + "), ' +')"
                ).alias("toks"),
            ).collect()
        }
        for w in words:
            assert got[w] == self._python_chain(w, merges), w

    def test_chain_equals_greedy_fold_on_run_free_words(self, spark):
        """Where no consecutive pair-run exists (all natural-language
        words here), the portable chain == the exact greedy fold."""
        from pg_analytics_spark.operators.bpe import replace_chain_sql
        from pg_analytics_spark.workload.llm import BPE_MERGES

        words = ["the", "northern", "andante", "inside", "refer",
                 "wonderful", "sand", "of", "offers", "thousand"]
        df = spark.createDataFrame([(w,) for w in words], "word string")
        chain = {
            r["word"]: r["toks"]
            for r in df.select(
                "word",
                F.expr(
                    "split(trim("
                    + replace_chain_sql("word", BPE_MERGES)
                    + "), ' +')"
                ).alias("toks"),
            ).collect()
        }
        greedy = {
            r["word"]: r["bpe_toks"]
            for r in bpe_segment(
                df, "word", [(a, b, 0) for a, b in BPE_MERGES]
            ).collect()
        }
        assert chain == greedy

    def test_chain_matches_duckdb_twin(self, spark):
        import duckdb

        from pg_analytics_spark.operators.bpe import (
            replace_chain_duckdb_sql,
            replace_chain_sql,
        )

        merges = [("t", "h"), ("th", "e"), ("o", "n"), ("on", "on")]
        words = ["the", "ononon", "python", "month", "o'neill"]
        df = spark.createDataFrame([(w,) for w in words], "word string")
        got = {
            r["word"]: r["s"]
            for r in df.select(
                "word",
                F.expr(replace_chain_sql("word", merges)).alias("s"),
            ).collect()
        }
        con = duckdb.connect()
        for w in words:
            (d,) = con.execute(
                "SELECT "
                + replace_chain_duckdb_sql("?::VARCHAR", merges),
                [w],
            ).fetchone()
            assert got[w] == d, w
