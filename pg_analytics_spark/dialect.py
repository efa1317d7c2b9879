"""Postgres/DuckDB → Spark SQL dialect rewrite shim.

The reference's raw-SQL surface is Postgres: its own tests exercise
``col::json->>'key'``, ``col::jsonb->>'key'``, bare ``col::json`` casts
and ``->``/``->>`` chains (/root/reference/tests/tests/json.rs:294-312,
351-353, 387-390), none of which parse in Spark SQL.  ``Engine.sql``
passes every query through :func:`rewrite_pg` so that reference-dialect
text executes unchanged.

What is rewritten (token-level, never inside string literals, quoted
identifiers, or comments):

* ``expr::json`` / ``expr::jsonb``     → ``expr`` (JSON is a string here,
  exactly the reference's VARCHAR-backed json cells, schema/cell.rs)
* ``expr -> 'k' ->> 'k2'`` chains      → ``get_json_object(expr, '$.k.k2')``
  (integer keys become ``[n]`` array steps)
* ``expr::int8`` and friends           → ``CAST(expr AS BIGINT)`` via the
  Postgres→Spark type-name table below

Lambda safety: Spark's own ``->`` (``transform(xs, x -> x + 1)``) is NOT
a JSON operator.  An arrow is only treated as JSON access when its key
is a string literal, or an integer on a chain whose base carried an
explicit ``::json``/``::jsonb`` cast — a lambda body never matches.
"""

from __future__ import annotations

import re

from pg_analytics_spark.errors import UnsupportedFormat as UnsupportedDialect

# Postgres type name → Spark SQL type name (src/schema/cell.rs type map;
# json/jsonb handled separately as identity).
PG_TYPE_MAP: dict[str, str] = {
    "int2": "SMALLINT",
    "smallint": "SMALLINT",
    "int4": "INT",
    "int": "INT",
    "integer": "INT",
    "int8": "BIGINT",
    "bigint": "BIGINT",
    "float4": "FLOAT",
    "real": "FLOAT",
    "float8": "DOUBLE",
    "double": "DOUBLE",
    "numeric": "DECIMAL",
    "decimal": "DECIMAL",
    "text": "STRING",
    "varchar": "STRING",
    "char": "STRING",
    "bpchar": "STRING",
    "bool": "BOOLEAN",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamptz": "TIMESTAMP",
    "time": "STRING",
    "uuid": "STRING",
    "json": None,  # identity: JSON values are strings in this engine
    "jsonb": None,
}

_TOKEN_RE = re.compile(
    r"""
      (?P<comment>--[^\n]*|/\*.*?\*/)
    | (?P<string>'(?:[^']|'')*')
    | (?P<qident>"(?:[^"]|"")*")
    | (?P<arrow2>->>)
    | (?P<arrow>->)
    | (?P<cast>::)
    | (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<word>[A-Za-z_][A-Za-z0-9_$]*)
    | (?P<ws>\s+)
    | (?P<op>.)
    """,
    re.VERBOSE | re.DOTALL,
)


def _tokenize(sql: str) -> list[tuple[str, str]]:
    return [(m.lastgroup, m.group()) for m in _TOKEN_RE.finditer(sql)]


def _prev_code(tokens, i):
    """Index of the previous non-whitespace/comment token, or -1."""
    i -= 1
    while i >= 0 and tokens[i][0] in ("ws", "comment"):
        i -= 1
    return i


def _next_code(tokens, i):
    i += 1
    while i < len(tokens) and tokens[i][0] in ("ws", "comment"):
        i += 1
    return i


# SQL keywords never absorbed as a function name when walking back over
# a parenthesized operand (``SELECT (x)::int`` casts ``(x)``, not a call).
_KEYWORDS = frozenset(
    """select where and or not when then else end case from join left right
    full inner outer cross on group by order having limit offset union
    intersect except all distinct as in like ilike rlike between is null
    true false over partition rows range values exists any some interval
    lateral using natural if returning with recursive window filter
    """.split()
)


def _operand_start(tokens, end):
    """Walk back from token index ``end`` (inclusive) over one primary
    expression: balanced ``(...)``/``[...]`` groups, a function-call
    name, qualified-name dots, a literal, or a single identifier.
    Returns the start index."""
    i = end
    if i < 0:
        return 0
    kind, text = tokens[i]
    if kind == "op" and text in (")", "]"):
        depth = 0
        while i >= 0:
            k, t = tokens[i]
            if k == "op" and t in (")", "]"):
                depth += 1
            elif k == "op" and t in ("(", "["):
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        # include a function name directly before '(' — but never a
        # keyword (``SELECT (x)::int`` is not a call to SELECT)
        j = _prev_code(tokens, i)
        if j >= 0 and (
            tokens[j][0] == "qident"
            or (tokens[j][0] == "word" and tokens[j][1].lower() not in _KEYWORDS)
        ):
            i = j
    elif kind in ("word", "qident", "string", "number"):
        pass
    else:
        return end  # unknown shape: keep minimal
    # absorb qualified-name dots: a.b.c
    while True:
        j = _prev_code(tokens, i)
        if j >= 0 and tokens[j] == ("op", "."):
            k = _prev_code(tokens, j)
            if k >= 0 and tokens[k][0] in ("word", "qident"):
                i = k
                continue
        break
    return i


def _strip_json_cast(tokens, end):
    """If the primary expression ending at ``end`` is ``base::json`` or
    ``base::jsonb``, return the index where ``base`` ends, else None."""
    if end >= 0 and tokens[end][0] == "word" and tokens[end][1].lower() in (
        "json",
        "jsonb",
    ):
        k = _prev_code(tokens, end)
        if k >= 0 and tokens[k][0] == "cast":
            return _prev_code(tokens, k)
    return None


def _json_path_step(kind, text):
    if kind == "string":
        key = text[1:-1].replace("''", "'")
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", key):
            return "." + key
        return "['" + key.replace("\\", "\\\\").replace("'", "\\'") + "']"
    return f"[{text}]"  # integer index


def _rewrite_arrows(tokens: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Collapse ``base (::json)? (-> key)* (->>|->) key`` into one
    ``get_json_object`` call.  Processes left-to-right, restarting after
    each rewrite (chains are short)."""
    i = 0
    while i < len(tokens):
        kind, _ = tokens[i]
        if kind not in ("arrow", "arrow2"):
            i += 1
            continue
        # key of the FIRST arrow in the chain decides JSON-ness
        ki = _next_code(tokens, i)
        if ki >= len(tokens) or tokens[ki][0] not in ("string", "number"):
            i += 1
            continue
        if tokens[ki][0] == "number" and "." in tokens[ki][1]:
            i += 1
            continue
        base_end = _prev_code(tokens, i)
        if base_end < 0:
            i += 1
            continue
        stripped = _strip_json_cast(tokens, base_end)
        had_cast = stripped is not None
        if had_cast:
            base_end = stripped
        if tokens[ki][0] == "number" and not had_cast:
            # integer key with no ::json cast → could be a lambda body
            # constant; leave untouched (lambda safety, module docstring)
            i += 1
            continue
        base_start = _operand_start(tokens, base_end)
        # consume the whole chain; ``j`` ends just past the last key token
        path, j = "", i
        while j < len(tokens) and tokens[j][0] in ("arrow", "arrow2"):
            kj = _next_code(tokens, j)
            if kj >= len(tokens) or tokens[kj][0] not in ("string", "number"):
                break
            if tokens[kj][0] == "number" and "." in tokens[kj][1]:
                break
            path += _json_path_step(*tokens[kj])
            j = kj + 1
            nxt = _next_code(tokens, kj)
            if nxt < len(tokens) and tokens[nxt][0] in ("arrow", "arrow2"):
                j = nxt
        base_text = "".join(t for _, t in tokens[base_start : base_end + 1])
        repl = [
            ("word", "get_json_object"),
            ("op", "("),
            ("word", base_text),
            ("op", ","),
            ("ws", " "),
            ("string", "'$" + path + "'"),
            ("op", ")"),
        ]
        tokens = tokens[:base_start] + repl + tokens[j:]
        i = base_start + len(repl)
    return tokens


def _rewrite_casts(tokens: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """``expr::type`` → ``CAST(expr AS SPARKTYPE)`` (or identity for
    json/jsonb).  Right-to-left so stacked casts nest correctly."""
    i = len(tokens) - 1
    while i >= 0:
        if tokens[i][0] != "cast":
            i -= 1
            continue
        ti = _next_code(tokens, i)
        if ti >= len(tokens) or tokens[ti][0] != "word":
            i -= 1
            continue
        tname = tokens[ti][1].lower()
        if tname == "double":
            nx = _next_code(tokens, ti)
            if nx < len(tokens) and tokens[nx] == ("word", "precision"):
                ti = nx
        if tname not in PG_TYPE_MAP:
            i -= 1
            continue
        # optional (p[,s]) argument on numeric/decimal/varchar
        type_end = ti
        nx = _next_code(tokens, ti)
        if nx < len(tokens) and tokens[nx] == ("op", "("):
            depth, j = 0, nx
            while j < len(tokens):
                if tokens[j] == ("op", "("):
                    depth += 1
                elif tokens[j] == ("op", ")"):
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            type_end = j
        base_end = _prev_code(tokens, i)
        if base_end < 0:
            i -= 1
            continue
        base_start = _operand_start(tokens, base_end)
        base_text = "".join(t for _, t in tokens[base_start : base_end + 1])
        spark_type = PG_TYPE_MAP[tname]
        if spark_type is None:
            repl = [("word", base_text)]  # ::json / ::jsonb → identity
        else:
            if tname in ("numeric", "decimal") and type_end != ti:
                args = "".join(t for _, t in tokens[ti + 1 : type_end + 1])
                spark_type = "DECIMAL" + args
            elif tname in ("varchar", "char", "bpchar") and type_end != ti:
                spark_type = "STRING"
            repl = [
                ("word", "CAST"),
                ("op", "("),
                ("word", base_text),
                ("ws", " "),
                ("word", "AS"),
                ("ws", " "),
                ("word", spark_type),
                ("op", ")"),
            ]
        tokens = tokens[:base_start] + repl + tokens[type_end + 1 :]
        i = base_start - 1
    return tokens


def _depths(tokens) -> list[int]:
    """Paren depth at each token (the token's own open paren counts)."""
    out, d = [], 0
    for kind, text in tokens:
        if kind == "op" and text == "(":
            d += 1
            out.append(d)
        elif kind == "op" and text == ")":
            out.append(d)
            d -= 1
        else:
            out.append(d)
    return out


def _rewrite_exclude(tokens: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """DuckDB ``* EXCLUDE (a, b)`` / ``* EXCLUDE a`` → Spark
    ``* EXCEPT (a, b)``.  Only fires when the previous code token is
    ``*`` — a column actually named exclude stays untouched."""
    i = 0
    while i < len(tokens):
        kind, text = tokens[i]
        if kind == "word" and text.lower() == "exclude":
            p = _prev_code(tokens, i)
            if p >= 0 and tokens[p] == ("op", "*"):
                tokens = list(tokens)
                tokens[i] = ("word", "EXCEPT")
                n = _next_code(tokens, i)
                if n < len(tokens) and tokens[n] != ("op", "("):
                    # single bare column (possibly qualified): add parens
                    j = n
                    while True:
                        nx = _next_code(tokens, j)
                        if (
                            nx < len(tokens)
                            and tokens[nx] == ("op", ".")
                        ):
                            k = _next_code(tokens, nx)
                            if k < len(tokens) and tokens[k][0] in (
                                "word",
                                "qident",
                            ):
                                j = k
                                continue
                        break
                    tokens = (
                        tokens[:n]
                        + [("op", "(")]
                        + tokens[n : j + 1]
                        + [("op", ")")]
                        + tokens[j + 1 :]
                    )
        i += 1
    return tokens


def _rewrite_star_replace(
    tokens: list[tuple[str, str]],
) -> list[tuple[str, str]]:
    """DuckDB ``* REPLACE (expr AS col, ...)`` → Spark
    ``* EXCEPT (col, ...), (expr) AS col, ...``.

    Values are identical; the one visible divergence is COLUMN ORDER —
    DuckDB keeps each replaced column in its original position, the
    rewrite moves them to the end of the star expansion (Spark has no
    in-place replace).  Only fires when the previous code token is
    ``*``, so the scalar ``replace(s, a, b)`` function never matches."""
    i = 0
    while i < len(tokens):
        kind, text = tokens[i]
        if kind == "word" and text.lower() == "replace":
            p = _prev_code(tokens, i)
            n = _next_code(tokens, i)
            if (
                p >= 0
                and tokens[p] == ("op", "*")
                and n < len(tokens)
                and tokens[n] == ("op", "(")
            ):
                depths = _depths(tokens)
                d = depths[n]
                close = next(
                    (
                        j
                        for j in range(n + 1, len(tokens))
                        if tokens[j] == ("op", ")") and depths[j] == d
                    ),
                    None,
                )
                if close is None:
                    i += 1
                    continue
                # split the argument list on top-level commas
                items: list[list[tuple[str, str]]] = [[]]
                for j in range(n + 1, close):
                    if tokens[j] == ("op", ",") and depths[j] == d:
                        items.append([])
                    else:
                        items[-1].append(tokens[j])
                repls: list[tuple[list[tuple[str, str]], tuple[str, str]]] = []
                ok = True
                for item in items:
                    as_pos = next(
                        (
                            j
                            for j in range(len(item) - 1, -1, -1)
                            if item[j][0] == "word"
                            and item[j][1].lower() == "as"
                        ),
                        None,
                    )
                    alias = None
                    if as_pos is not None:
                        rest = [
                            t
                            for t in item[as_pos + 1 :]
                            if t[0] not in ("ws", "comment")
                        ]
                        if len(rest) == 1 and rest[0][0] in ("word", "qident"):
                            alias = rest[0]
                    if alias is None:
                        ok = False  # malformed: leave for Spark's error
                        break
                    expr = item[:as_pos]
                    repls.append((expr, alias))
                if not ok or not repls:
                    i += 1
                    continue
                new: list[tuple[str, str]] = [
                    ("word", "EXCEPT"),
                    ("ws", " "),
                    ("op", "("),
                ]
                for j, (_, alias) in enumerate(repls):
                    if j:
                        new += [("op", ","), ("ws", " ")]
                    new.append(alias)
                new += [("op", ")")]
                for expr, alias in repls:
                    new += [("op", ","), ("ws", " "), ("op", "(")]
                    new += expr
                    new += [("op", ")"), ("ws", " "), ("word", "AS"),
                            ("ws", " "), alias]
                tokens = tokens[:i] + new + tokens[close + 1 :]
                i += len(new)
                continue
        i += 1
    return tokens


#: clause keywords that end a QUALIFY predicate at the same depth
_QUALIFY_STOP = frozenset(
    "order limit offset union intersect except window".split()
)

#: clause keywords that end an ORDER BY item list at the same depth
_ORDER_STOP = frozenset("limit offset union intersect except".split())


def _rewrite_distinct_on(
    tokens: list[tuple[str, str]],
) -> list[tuple[str, str]]:
    """Postgres/DuckDB ``SELECT DISTINCT ON (k, ...) <list> ... ORDER BY
    k, x`` → first row per (k, ...) group in ORDER BY order, via an
    injected ``QUALIFY row_number() OVER (PARTITION BY k, ...
    ORDER BY k, x) = 1`` that the QUALIFY rewriter (which runs next)
    wraps into Spark SQL.  The trailing ORDER BY stays — Postgres
    semantics order the result too.  Without an ORDER BY the survivor
    is arbitrary in both engines; the rewrite pins it to ORDER BY
    (partition keys) for determinism."""
    while True:
        depths = _depths(tokens)
        hit = None
        for i, (k, t) in enumerate(tokens):
            if k == "word" and t.lower() == "distinct":
                n = _next_code(tokens, i)
                p = _prev_code(tokens, i)
                if (
                    p >= 0
                    and tokens[p][0] == "word"
                    and tokens[p][1].lower() == "select"
                    and n < len(tokens)
                    and tokens[n][0] == "word"
                    and tokens[n][1].lower() == "on"
                ):
                    po = _next_code(tokens, n)
                    if po < len(tokens) and tokens[po] == ("op", "("):
                        hit = (i, n, po)
                        break
        if hit is None:
            return tokens
        i, n, po = hit
        d = depths[po]
        close = next(
            (
                j
                for j in range(po + 1, len(tokens))
                if tokens[j] == ("op", ")") and depths[j] == d
            ),
            None,
        )
        if close is None:
            return tokens
        on_exprs = tokens[po + 1 : close]
        dq = depths[i]
        # trailing ORDER BY at this depth, if any
        ob = None
        j = close + 1
        while j < len(tokens):
            if depths[j] < dq or (
                depths[j] == dq and tokens[j] == ("op", ")")
            ):
                break
            if (
                depths[j] == dq
                and tokens[j][0] == "word"
                and tokens[j][1].lower() == "order"
            ):
                nb = _next_code(tokens, j)
                if (
                    nb < len(tokens)
                    and tokens[nb][0] == "word"
                    and tokens[nb][1].lower() == "by"
                ):
                    ob = (j, nb)
                    break
            j += 1
        if ob is not None:
            k0 = _next_code(tokens, ob[1])
            k1 = k0
            while k1 < len(tokens):
                if depths[k1] < dq or (
                    depths[k1] == dq and tokens[k1] == ("op", ")")
                ):
                    break
                if (
                    depths[k1] == dq
                    and tokens[k1][0] == "word"
                    and tokens[k1][1].lower() in _ORDER_STOP
                ):
                    break
                k1 += 1
            order_items = tokens[k0:k1]
            insert_at = ob[0]
        else:
            order_items = on_exprs
            # insert before the first trailing stop clause (or scope end)
            insert_at = close + 1
            while insert_at < len(tokens):
                if depths[insert_at] < dq or (
                    depths[insert_at] == dq
                    and tokens[insert_at] == ("op", ")")
                ):
                    break
                if (
                    depths[insert_at] == dq
                    and tokens[insert_at][0] == "word"
                    and tokens[insert_at][1].lower() in _ORDER_STOP
                ):
                    break
                insert_at += 1
        qual = (
            [("ws", " "), ("word", "QUALIFY"), ("ws", " "),
             ("word", "row_number"), ("op", "("), ("op", ")"), ("ws", " "),
             ("word", "OVER"), ("ws", " "), ("op", "("),
             ("word", "PARTITION"), ("ws", " "), ("word", "BY"), ("ws", " ")]
            + list(on_exprs)
            + [("ws", " "), ("word", "ORDER"), ("ws", " "), ("word", "BY"),
               ("ws", " ")]
            + list(order_items)
            + [("op", ")"), ("ws", " "), ("op", "="), ("ws", " "),
               ("number", "1"), ("ws", " ")]
        )
        tokens = (
            tokens[:i]  # drop DISTINCT
            + tokens[close + 1 : insert_at]
            + qual
            + tokens[insert_at:]
        )


def _rewrite_qualify(tokens: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """DuckDB/Snowflake ``QUALIFY pred`` → computed filter column:

    ``SELECT <list> FROM ... QUALIFY pred [trailing]`` becomes
    ``SELECT * EXCEPT (__qual) FROM (SELECT <list>, (pred) AS __qual
    FROM ...) __qq WHERE __qual [trailing]``.

    The predicate may contain window functions (computed in the inner
    select list) or references to select-list aliases (Spark's lateral
    column alias resolution).  Trailing ORDER BY/LIMIT stay outside the
    wrap, where the inner aliases remain visible.  ``SELECT DISTINCT …
    QUALIFY`` is left unrewritten (the computed column would change the
    distinct key)."""
    while True:
        depths = _depths(tokens)
        q = next(
            (
                i
                for i, (k, t) in enumerate(tokens)
                if k == "word" and t.lower() == "qualify"
            ),
            None,
        )
        if q is None:
            return tokens
        dq = depths[q]
        sel = next(
            (
                i
                for i in range(q - 1, -1, -1)
                if depths[i] == dq
                and tokens[i][0] == "word"
                and tokens[i][1].lower() == "select"
            ),
            None,
        )
        if sel is None:
            return tokens
        nx = _next_code(tokens, sel)
        if (
            nx < len(tokens)
            and tokens[nx][0] == "word"
            and tokens[nx][1].lower() == "distinct"
        ):
            return tokens
        frm = next(
            (
                i
                for i in range(sel + 1, q)
                if depths[i] == dq
                and tokens[i][0] == "word"
                and tokens[i][1].lower() == "from"
            ),
            None,
        )
        if frm is None:
            return tokens
        j = q + 1
        while j < len(tokens):
            if depths[j] < dq:
                break
            k, t = tokens[j]
            if depths[j] == dq and k == "op" and t == ")":
                break  # the paren closing this subquery's scope
            if (
                depths[j] == dq
                and k == "word"
                and t.lower() in _QUALIFY_STOP
            ):
                break
            j += 1
        pred = tokens[q + 1 : j]
        inner = (
            tokens[sel:frm]
            + [("op", ","), ("ws", " "), ("op", "(")]
            + pred
            + [("op", ")"), ("ws", " "), ("word", "AS"), ("ws", " "),
               ("word", "__qual"), ("ws", " ")]
            + tokens[frm:q]
        )
        repl = (
            [
                ("word", "SELECT"), ("ws", " "), ("op", "*"), ("ws", " "),
                ("word", "EXCEPT"), ("ws", " "), ("op", "("),
                ("word", "__qual"), ("op", ")"), ("ws", " "),
                ("word", "FROM"), ("ws", " "), ("op", "("),
            ]
            + inner
            + [
                ("op", ")"), ("ws", " "), ("word", "__qq"), ("ws", " "),
                ("word", "WHERE"), ("ws", " "), ("word", "__qual"),
                ("ws", " "),
            ]
        )
        tokens = tokens[:sel] + repl + tokens[j:]


_EXTRA_RE = re.compile(
    r"\b(qualify|exclude|list_\w+|array_to_string|regexp_matches"
    r"|string_to_array|starts_with|ends_with|unnest|arg_?max|arg_?min)\b"
    r"|\*\s+replace\s*\(|\bdistinct\s+on\b|\basof\s+(left\s+)?join\b"
    r"|\busing\s+sample\b|\bpositional\s+join\b"
    r"|\b(ignore|respect)\s+nulls\s*\)"
    r"|,\s*\)|,\s*(from|where|group|order|having|limit|offset"
    r"|union|except|intersect|qualify|window)\b"
    r"|\bgenerate_series\b",
    re.IGNORECASE,
)


_ASOF_STOP = frozenset(
    "where group order having limit offset qualify union intersect except "
    "join left right full inner cross asof window".split()
)


def _rewrite_using_sample(tokens: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """DuckDB ``USING SAMPLE n% | n PERCENT | n ROWS [(method)]`` →
    Spark ``TABLESAMPLE (n PERCENT|ROWS)``.  A method annotation
    (bernoulli/system/reservoir) is dropped — Spark's TABLESAMPLE is
    Bernoulli row sampling; reservoir's exact-count behavior maps to
    the ROWS form.  Sampling is nondeterministic in BOTH engines, so
    this is a syntax-acceptance rewrite, not an oracle-checkable one
    (tests assert sample-size behavior, not values).

    Only the FROM-relation position is supported.  DuckDB also
    accepts ``… WHERE p USING SAMPLE n`` (sample AFTER filtering —
    different semantics, and splicing TABLESAMPLE mid-predicate would
    be unparseable anyway): that position raises UnsupportedDialect
    with a clear message instead of producing broken SQL."""
    out: list[tuple[str, str]] = []
    # per-paren-scope "a WHERE has started in this SELECT" flag; reset
    # by a new SELECT at the same depth (UNION branches)
    where_scope = [False]
    i, n = 0, len(tokens)
    while i < n:
        kind, text = tokens[i]
        if kind == "op" and text == "(":
            where_scope.append(False)
        elif kind == "op" and text == ")":
            if len(where_scope) > 1:
                where_scope.pop()
        elif kind == "word":
            low = text.lower()
            if low == "where":
                where_scope[-1] = True
            elif low == "select":
                where_scope[-1] = False
        if not (kind == "word" and text.lower() == "using"):
            out.append(tokens[i])
            i += 1
            continue
        j = _next_code(tokens, i)
        if j >= n or tokens[j][1].lower() != "sample":
            out.append(tokens[i])
            i += 1
            continue
        if where_scope[-1] and _next_code(tokens, j) < n and tokens[
            _next_code(tokens, j)
        ][0] == "number":
            raise UnsupportedDialect(
                "USING SAMPLE after WHERE (post-filter sampling) is not "
                "supported — move the sample clause next to the FROM "
                "relation (pre-filter TABLESAMPLE semantics)"
            )
        j = _next_code(tokens, j)
        if j >= n or tokens[j][0] != "number":
            # a relation literally named `sample` (MERGE INTO t USING
            # sample s ON …) — not the sampling clause; pass through
            out.append(tokens[i])
            i += 1
            continue
        num = tokens[j][1]
        j2 = _next_code(tokens, j)
        unit = None
        if j2 < n and tokens[j2] == ("op", "%"):
            unit, j = "PERCENT", j2
        elif j2 < n and tokens[j2][0] == "word" and tokens[j2][1].lower() in (
            "percent",
            "rows",
        ):
            unit, j = tokens[j2][1].upper(), j2
        else:
            unit = "ROWS"  # DuckDB's bare `USING SAMPLE 15` means rows
            j2 = j
        # optional trailing (method)
        k = _next_code(tokens, j)
        if k < n and tokens[k] == ("op", "("):
            depth = 0
            while k < n:
                if tokens[k] == ("op", "("):
                    depth += 1
                elif tokens[k] == ("op", ")"):
                    depth -= 1
                    if depth == 0:
                        break
                k += 1
            j = k
        clause = ("word", f" TABLESAMPLE ({num} {unit}) ")
        # Spark's grammar puts the sample BEFORE the table alias
        # (`FROM t TABLESAMPLE (…) a`); DuckDB writes `FROM t a USING
        # SAMPLE …` — if the preceding code token is an alias word,
        # insert the clause in front of it.
        ins = len(out)
        last = _prev_code(out, len(out))
        if (
            last >= 0
            and out[last][0] == "word"
            and out[last][1].lower() not in _KEYWORDS
        ):
            before = _prev_code(out, last)
            if before >= 0:
                bk, bt = out[before]
                if bk == "word" and bt.lower() == "as":
                    ins = before  # `t AS x` — clause goes before AS
                elif (
                    bk == "qident"
                    or bt == ")"
                    or (bk == "word" and bt.lower() not in _KEYWORDS)
                ):
                    ins = last  # `t x` — clause goes before the alias
                # else: `FROM t` — last IS the table name, keep in place
        out.insert(ins, clause)
        i = j + 1
    return out


def _is_value_predecessor(toks, idx: int) -> bool:
    """True when the code token before ``idx`` yields a value — i.e. a
    following ``[`` is a SUBSCRIPT/SLICE, not a list-literal start.
    Shared by the comprehension and slice passes so the two subscript
    definitions cannot drift."""
    prev = _prev_code(toks, idx)
    if prev < 0:
        return False
    pk, pt = toks[prev]
    return (
        (pk in ("word", "qident") and pt.lower() not in _KEYWORDS)
        or pk in ("string", "number")
        or pt in (")", "]", "}")
    )


def _rewrite_list_comprehensions(tokens: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """DuckDB list comprehensions and list literals → Spark HOFs:

        ``[f(x) for x in l]``          → ``transform(l, x -> f(x))``
        ``[f(x) for x in l if p(x)]``  → ``transform(filter(l, x -> p(x)), x -> f(x))``
        ``[a, b, c]``                  → ``array(a, b, c)``

    Nested comprehensions recurse (each captured piece is rewritten
    before stringifying).  A ``[`` directly after an identifier/``)``/
    ``]`` is a SUBSCRIPT and passes through untouched, so ``l[2]`` and
    ``matrix[1][2]`` keep DuckDB's indexing form for the later
    element_at shim / Spark's own bracket support."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(tokens)
    while i < n:
        if tokens[i] != ("op", "["):
            out.append(tokens[i])
            i += 1
            continue
        if _is_value_predecessor(out, len(out)):
            out.append(tokens[i])  # subscript position
            i += 1
            continue
        # find the matching ']'
        depth, j = 0, i
        while j < n:
            if tokens[j] == ("op", "["):
                depth += 1
            elif tokens[j] == ("op", "]"):
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if j >= n:
            out.append(tokens[i])
            i += 1
            continue
        inner = tokens[i + 1 : j]
        # top-level 'for' within inner ((), [] both tracked)
        d2 = 0
        for_at = -1
        for x, (kk, tt) in enumerate(inner):
            if kk == "op" and tt in ("(", "["):
                d2 += 1
            elif kk == "op" and tt in (")", "]"):
                d2 -= 1
            elif d2 == 0 and kk == "word" and tt.lower() == "for":
                for_at = x
                break
        def _sqlify(ts):
            return "".join(
                t for _, t in _rewrite_list_comprehensions(list(ts))
            ).strip()

        if for_at < 0:
            out.append(("word", f"array({_sqlify(inner)})"))
            i = j + 1
            continue
        expr_toks = inner[:for_at]
        v = _next_code(inner, for_at)
        if v >= len(inner) or inner[v][0] != "word":
            out.append(tokens[i])
            i += 1
            continue
        var = inner[v][1]
        in_at = _next_code(inner, v)
        if in_at >= len(inner) or inner[in_at][1].lower() != "in":
            out.append(tokens[i])
            i += 1
            continue
        # list part runs to a top-level 'if' (or the end)
        d2 = 0
        if_at = -1
        for x in range(in_at + 1, len(inner)):
            kk, tt = inner[x]
            if kk == "op" and tt in ("(", "["):
                d2 += 1
            elif kk == "op" and tt in (")", "]"):
                d2 -= 1
            elif d2 == 0 and kk == "word" and tt.lower() == "if":
                if_at = x
                break
        lst_end = if_at if if_at >= 0 else len(inner)
        lst = _sqlify(inner[in_at + 1 : lst_end])
        expr = _sqlify(expr_toks)
        if if_at >= 0:
            cond = _sqlify(inner[if_at + 1 :])
            lst = f"filter({lst}, {var} -> {cond})"
        out.append(("word", f"transform({lst}, {var} -> {expr})"))
        i = j + 1
    return out


def _rewrite_array_slices(tokens: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """DuckDB list slicing → Spark ``slice``:

        ``l[2:4]`` → ``slice(l, 2, 4-(2)+1)``   (both bounds inclusive)
        ``l[:3]``  → ``slice(l, 1, 3)``
        ``l[2:]``  → ``slice(l, 2, greatest(size(l)-(2)+1, 0))``

    Bounds are CLAMPED to DuckDB's semantics (lo < 1 reads from the
    start, hi < lo yields an empty list) so expression bounds can
    never crash a job Spark-side where DuckDB returns a value.
    Negative LITERAL bounds (count-from-the-end, different rules than
    Spark's negative ``slice`` start) pass through to a loud error
    rather than a silently different answer.  A plain subscript
    ``l[2]`` (no ``:``) is left for Spark's own bracket support."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(tokens)
    while i < n:
        if tokens[i] != ("op", "["):
            out.append(tokens[i])
            i += 1
            continue
        prev = _prev_code(out, len(out))
        if not _is_value_predecessor(out, len(out)):
            out.append(tokens[i])
            i += 1
            continue
        depth, j = 0, i
        while j < n:
            if tokens[j][0] == "op" and tokens[j][1] in ("[", "("):
                depth += 1
            elif tokens[j][0] == "op" and tokens[j][1] in ("]", ")"):
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if j >= n or tokens[j] != ("op", "]"):
            out.append(tokens[i])
            i += 1
            continue
        inner = tokens[i + 1 : j]
        d2, colon = 0, -1
        for x, (kk, tt) in enumerate(inner):
            if kk == "op" and tt in ("(", "["):
                d2 += 1
            elif kk == "op" and tt in (")", "]"):
                d2 -= 1
            elif (kk, tt) == ("op", ":") and d2 == 0:
                colon = x
                break
        if colon < 0:
            out.append(tokens[i])  # plain subscript
            i += 1
            continue
        lo = "".join(t for _, t in inner[:colon]).strip()
        hi = "".join(t for _, t in inner[colon + 1 :]).strip()
        if lo.startswith("-") or hi.startswith("-"):
            out.append(tokens[i])  # negative slicing: not rewritten
            i += 1
            continue
        start = _operand_start(out, prev)
        operand = "".join(t for _, t in out[start : prev + 1]).strip()
        if lo and hi:
            s = f"greatest(({lo}), 1)"
            repl = f"slice({operand}, {s}, greatest(({hi})-{s}+1, 0))"
        elif hi:
            repl = f"slice({operand}, 1, greatest(({hi}), 0))"
        elif lo:
            s = f"greatest(({lo}), 1)"
            repl = (
                f"slice({operand}, {s}, "
                f"greatest(size({operand})-{s}+1, 0))"
            )
        else:
            repl = operand  # l[:] — identity
        out = out[:start] + [("word", repl)]
        i = j + 1
    return out


def _rewrite_plain_subscripts(
    tokens: list[tuple[str, str]]
) -> list[tuple[str, str]]:
    """DuckDB plain subscript → Spark ``try_element_at``:

        ``l[2]``      → ``try_element_at(l, 2)``
        ``l[i + 1]``  → ``try_element_at(l, i + 1)``
        ``m[42]``     → ``try_element_at(m, 42)``   (map key lookup)

    DuckDB list subscripts are 1-BASED with NULL at index 0 and out of
    bounds, and count from the end on negatives; Spark's native
    bracket is 0-based and (under ANSI) ERRORS out of bounds — passing
    the bracket through unchanged is a silent off-by-one, the worst
    failure mode a dialect shim can have.  ``try_element_at``
    reproduces DuckDB exactly on every point (1-based, NULL at 0/OOB,
    negative-from-end) and doubles as DuckDB's map-value lookup.
    STRING-literal subscripts are left alone: Spark's own map bracket
    handles ``m['k']`` natively, and a struct ``s['field']`` errors
    loudly rather than silently differing.  Runs AFTER the slice pass,
    so a remaining depth-0 ``:`` means an unrewritten (negative-bound)
    slice — left for the loud error path."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(tokens)
    while i < n:
        if tokens[i] != ("op", "["):
            out.append(tokens[i])
            i += 1
            continue
        prev = _prev_code(out, len(out))
        if not _is_value_predecessor(out, len(out)):
            out.append(tokens[i])
            i += 1
            continue
        depth, j = 0, i
        while j < n:
            if tokens[j][0] == "op" and tokens[j][1] in ("[", "("):
                depth += 1
            elif tokens[j][0] == "op" and tokens[j][1] in ("]", ")"):
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if j >= n or tokens[j] != ("op", "]"):
            out.append(tokens[i])
            i += 1
            continue
        inner = tokens[i + 1 : j]
        code = [t for t in inner if t[0] not in ("ws", "comment")]
        d2 = 0
        has_colon = has_comma = False
        for kk, tt in inner:
            if kk == "op" and tt in ("(", "["):
                d2 += 1
            elif kk == "op" and tt in (")", "]"):
                d2 -= 1
            elif (kk, tt) == ("op", ":") and d2 == 0:
                has_colon = True
            elif (kk, tt) == ("op", ",") and d2 == 0:
                has_comma = True
        pk, pt = out[prev]
        if pk == "word" and pt.lower() == "array":
            # pg ARRAY[...] constructor, not a subscript on a value
            # named `array` — translate to Spark's array(...) call
            idx = "".join(t for _, t in inner).strip()
            out = out[:prev] + [("word", f"array({idx})")]
            i = j + 1
            continue
        if (
            not code
            or has_colon  # unrewritten slice: loud error path
            or has_comma  # multi-expression bracket: not a subscript
            or (len(code) == 1 and code[0][0] == "string")
        ):
            out.append(tokens[i])
            i += 1
            continue
        if out[prev][0] == "string":
            # 'abc'[2] is DuckDB 1-based CHARACTER indexing — a
            # different operation; left for Spark's loud error rather
            # than a silently different answer
            out.append(tokens[i])
            i += 1
            continue
        start = _operand_start(out, prev)
        operand = "".join(t for _, t in out[start : prev + 1]).strip()
        idx = "".join(t for _, t in inner).strip()
        if len(code) == 1 and code[0] == ("number", "0"):
            # DuckDB l[0] is NULL; Spark's try_element_at REFUSES
            # index 0 (INVALID_INDEX_OF_ZERO) — fold the literal
            repl = "NULL"
        else:
            # a DYNAMIC index that evaluates to 0 still errors loudly
            # Spark-side — the one DuckDB edge not reproduced (NULL
            # there); loud beats a silent divergence
            repl = f"try_element_at({operand}, {idx})"
        out = out[:start] + [("word", repl)]
        i = j + 1
    return out


def _rewrite_struct_literals(tokens: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """DuckDB struct literals → Spark ``named_struct``:

        ``{'a': 1, 'b': x + 1}`` → ``named_struct('a', 1, 'b', x + 1)``

    Keys may be quoted strings or bare words; values recurse (nested
    structs).  Anything brace-shaped that does not parse as
    ``key: value`` pairs passes through untouched."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(tokens)
    while i < n:
        if tokens[i] != ("op", "{"):
            out.append(tokens[i])
            i += 1
            continue
        depth, j = 0, i
        while j < n:
            if tokens[j] == ("op", "{"):
                depth += 1
            elif tokens[j] == ("op", "}"):
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if j >= n:
            out.append(tokens[i])
            i += 1
            continue
        inner = tokens[i + 1 : j]
        # split top-level commas (all bracket kinds tracked)
        parts, cur, d2 = [], [], 0
        for tk in inner:
            if tk[0] == "op" and tk[1] in ("(", "[", "{"):
                d2 += 1
            elif tk[0] == "op" and tk[1] in (")", "]", "}"):
                d2 -= 1
            if tk == ("op", ",") and d2 == 0:
                parts.append(cur)
                cur = []
            else:
                cur.append(tk)
        parts.append(cur)
        pairs = []
        ok = bool(inner)
        for part in parts:
            colon = -1
            d2 = 0
            for x, tk in enumerate(part):
                if tk[0] == "op" and tk[1] in ("(", "[", "{"):
                    d2 += 1
                elif tk[0] == "op" and tk[1] in (")", "]", "}"):
                    d2 -= 1
                elif tk == ("op", ":") and d2 == 0:
                    colon = x
                    break
            if colon < 0:
                ok = False
                break
            key_toks = [t for t in part[:colon] if t[0] not in ("ws", "comment")]
            if len(key_toks) != 1 or key_toks[0][0] not in ("string", "word", "qident"):
                ok = False
                break
            kk, kt = key_toks[0]
            key = kt if kk == "string" else "'" + kt.strip('"') + "'"
            val = "".join(
                t for _, t in _rewrite_struct_literals(part[colon + 1 :])
            ).strip()
            if not val:
                ok = False
                break
            pairs.append((key, val))
        if not ok:
            out.append(tokens[i])
            i += 1
            continue
        body = ", ".join(f"{k}, {v}" for k, v in pairs)
        out.append(("word", f"named_struct({body})"))
        i = j + 1
    return out


def _parse_asof_on(cond_toks, b_alias: str):
    """Classify an ASOF ON conjunction for union+window routing.

    Returns ``(eqs, (a_ts, b_ts, backward, strict))`` where ``eqs`` is
    [(a_expr, b_expr), …] from the equality conjuncts, or ``None``
    when the shape is not routable (non-column operands, extra
    predicates, zero or multiple range inequalities) — callers fall
    back to the correlated-LATERAL rewrite then.
    """

    def _dotted(ts):
        # alias.col[.field…] — words/qidents separated by dots
        if len(ts) < 3 or len(ts) % 2 == 0:
            return None
        for x, (kk, tt) in enumerate(ts):
            if x % 2 == 0:
                if kk not in ("word", "qident") or (
                    kk == "word" and tt.lower() in _KEYWORDS
                ):
                    return None
            elif (kk, tt) != ("op", "."):
                return None
        return "".join(t for _, t in ts)

    def _is_b(expr: str) -> bool:
        return expr.split(".", 1)[0].strip('"').lower() == b_alias.strip(
            '"'
        ).lower()

    conj, cur, depth = [], [], 0
    for tk in cond_toks:
        kd, td = tk
        if kd == "op" and td == "(":
            depth += 1
        elif kd == "op" and td == ")":
            depth -= 1
        if depth == 0 and kd == "word" and td.lower() == "and":
            conj.append(cur)
            cur = []
        else:
            cur.append(tk)
    conj.append(cur)

    eqs, ineq = [], None
    for c in conj:
        code = [(kk, tt) for kk, tt in c if kk not in ("ws", "comment")]
        ops = [
            x
            for x, (kk, tt) in enumerate(code)
            if kk == "op" and tt in ("=", "<", ">")
        ]
        if not ops:
            return None
        oi = ops[0]
        op = code[oi][1]
        rhs_start = oi + 1
        if op in ("<", ">") and rhs_start < len(code) and code[
            rhs_start
        ] == ("op", "="):
            op += "="
            rhs_start += 1
        lhs = _dotted(code[:oi])
        rhs = _dotted(code[rhs_start:])
        if lhs is None or rhs is None:
            return None
        if op == "=":
            if _is_b(lhs) and not _is_b(rhs):
                eqs.append((rhs, lhs))
            elif _is_b(rhs) and not _is_b(lhs):
                eqs.append((lhs, rhs))
            else:
                return None
            continue
        if ineq is not None:
            return None  # two range inequalities — not ASOF shape
        strict = op in ("<", ">")
        if _is_b(lhs) and not _is_b(rhs):
            ineq = (rhs, lhs, op.startswith("<"), strict)
        elif _is_b(rhs) and not _is_b(lhs):
            ineq = (lhs, rhs, op.startswith(">"), strict)
        else:
            return None
    if ineq is None:
        return None
    return eqs, ineq


def _rewrite_asof_union(sql: str) -> str | None:
    """Route a top-level ``a ASOF [LEFT] JOIN b ON eq-keys AND ineq``
    statement to the ONE-shuffle union+window dataflow — the same
    sort-merge formulation as :func:`operators.temporal.asof_join`,
    expressed as SQL so it composes with the statement's CTEs:

        both sides union with a marker; one window pass per key
        carries the nearest right row (as a struct) to each left row.

    The joined relation exposes each side's row as a STRUCT column
    named by its alias, so ``a.x`` / ``b.y`` / ``a.*`` references in
    the outer query resolve unchanged (struct field access / struct
    star); a bare top-level ``*`` is rewritten to ``a.*, b.*``.

    Returns ``None`` whenever the shape is not routable (chained
    joins on the left, subquery right side, non-equi extras in ON,
    unqualified operands) — the caller then uses the LATERAL rewrite,
    and Engine.sql additionally retries via LATERAL if this plan
    fails analysis (e.g. an unqualified outer column reference).

    Reference analog: /root/reference/src/hooks/executor.rs:71
    delegates ASOF to DuckDB's sorted-merge executor for the same
    reason — a generic join plan is quadratic per hot key.
    """
    tokens = _tokenize(sql)
    depths = _depths(tokens)
    n = len(tokens)
    asof_at = [
        x
        for x, (kk, tt) in enumerate(tokens)
        if kk == "word" and tt.lower() == "asof" and depths[x] == 0
    ]
    if len(asof_at) != 1:
        return None
    i = asof_at[0]
    j = _next_code(tokens, i)
    left_join = False
    if j < n and tokens[j][1].lower() == "left":
        left_join = True
        j = _next_code(tokens, j)
    if j >= n or tokens[j][1].lower() != "join":
        return None
    # ---- right side: dotted name | (subquery), then [AS] [alias] ----
    j = _next_code(tokens, j)
    if j < n and tokens[j] == ("op", "("):
        depth, q = 0, j
        while q < n:
            if tokens[q] == ("op", "("):
                depth += 1
            elif tokens[q] == ("op", ")"):
                depth -= 1
                if depth == 0:
                    break
            q += 1
        if q >= n:
            return None
        b_name = "".join(t for _, t in tokens[j : q + 1])
        b_alias = None
        j2 = _next_code(tokens, q)
    elif j < n and tokens[j][0] == "word" and tokens[j][1].lower() not in _KEYWORDS:
        b_name = tokens[j][1]
        j2 = _next_code(tokens, j)
        while j2 < n and tokens[j2] == ("op", "."):
            j2 = _next_code(tokens, j2)
            if j2 >= n or tokens[j2][0] not in ("word", "qident"):
                return None
            b_name += "." + tokens[j2][1]
            j2 = _next_code(tokens, j2)
        b_alias = b_name.split(".")[-1]
    else:
        return None
    b_rel = b_name
    if j2 < n and tokens[j2][0] == "word" and tokens[j2][1].lower() == "as":
        j2 = _next_code(tokens, j2)
    if (
        j2 < n
        and tokens[j2][0] == "word"
        and tokens[j2][1].lower() != "on"
        and tokens[j2][1].lower() not in _KEYWORDS
    ):
        b_alias = tokens[j2][1]
        b_rel = f"{b_name} {b_alias}"
        j2 = _next_code(tokens, j2)
    if b_alias is None:
        return None  # subquery right side needs an alias
    if j2 >= n or tokens[j2][1].lower() != "on":
        return None
    cond_start = _next_code(tokens, j2)
    k = cond_start
    while k < n:
        tk, tt = tokens[k]
        if depths[k] == 0 and tk == "word" and tt.lower() in _ASOF_STOP:
            break
        k += 1
    parsed = _parse_asof_on(tokens[cond_start:k], b_alias)
    if parsed is None:
        return None
    eqs, (a_ts, b_ts, backward, strict) = parsed
    # ---- left side: the single relation right before ASOF -----------
    b_idx = -1
    for x in range(i - 1, -1, -1):
        if depths[x] == 0 and (
            (tokens[x][0] == "word" and tokens[x][1].lower() == "from")
            or tokens[x] == ("op", ",")
        ):
            b_idx = x
            break
    if b_idx < 0:
        return None
    p = _next_code(tokens, b_idx)
    if p >= i:
        return None
    if tokens[p] == ("op", "("):
        depth, q = 0, p
        while q < i:
            if tokens[q] == ("op", "("):
                depth += 1
            elif tokens[q] == ("op", ")"):
                depth -= 1
                if depth == 0:
                    break
            q += 1
        if q >= i:
            return None
        after = _next_code(tokens, q)
        if after < i and tokens[after][0] == "word" and tokens[after][
            1
        ].lower() == "as":
            after = _next_code(tokens, after)
        if after >= i or tokens[after][0] not in ("word", "qident"):
            return None  # subquery left side needs an alias
        a_alias = tokens[after][1]
        rel_end = after
    elif tokens[p][0] == "word" and tokens[p][1].lower() not in _KEYWORDS:
        a_alias = tokens[p][1]  # last dotted segment wins below
        rel_end = p
        scan = _next_code(tokens, p)
        while scan < i and tokens[scan] == ("op", "."):
            scan = _next_code(tokens, scan)  # the segment word
            if scan >= i or tokens[scan][0] not in ("word", "qident"):
                return None
            a_alias = tokens[scan][1]
            rel_end = scan
            scan = _next_code(tokens, scan)
        if scan < i and tokens[scan][0] == "word" and tokens[scan][
            1
        ].lower() == "as":
            scan = _next_code(tokens, scan)
            if scan >= i or tokens[scan][0] not in ("word", "qident"):
                return None
            a_alias = tokens[scan][1]
            rel_end = scan
        elif (
            scan < i
            and tokens[scan][0] in ("word", "qident")
            and tokens[scan][1].lower() not in _KEYWORDS
        ):
            a_alias = tokens[scan][1]
            rel_end = scan
    else:
        return None
    if _next_code(tokens, rel_end) != i:
        return None  # trailing junk between the left relation and ASOF
    a_rel = "".join(t for _, t in tokens[p : rel_end + 1]).strip()
    # ---- build the union+window relation ----------------------------
    n_k = len(eqs)
    a_keys = "".join(f"{a} AS _k{x}, " for x, (a, _) in enumerate(eqs))
    b_keys = "".join(f"{b}, " for _, b in eqs)
    part = (
        "PARTITION BY " + ", ".join(f"_k{x}" for x in range(n_k)) + " "
        if n_k
        else ""
    )
    tsdir = "ASC" if backward else "DESC"
    tiedir = "DESC" if strict else "ASC"
    notnull = " AND ".join(
        [f"{b} IS NOT NULL" for _, b in eqs] + [f"{b_ts} IS NOT NULL"]
    )
    inner_filter = "" if left_join else " AND _rpick IS NOT NULL"
    rel = (
        f"(SELECT _lrow AS {a_alias}, _rpick AS {b_alias} FROM ("
        f"SELECT _lrow, _is_l, last(_rrow, true) OVER ({part}"
        f"ORDER BY _ts {tsdir} NULLS FIRST, _is_l {tiedir} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _rpick "
        f"FROM (SELECT {a_keys}{a_ts} AS _ts, 1 AS _is_l, "
        f"struct({a_alias}.*) AS _lrow, NULL AS _rrow FROM {a_rel} "
        f"UNION ALL SELECT {b_keys}{b_ts}, 0, NULL, struct({b_alias}.*) "
        f"FROM {b_rel} WHERE {notnull}) __asof_u"
        f") __asof_w WHERE _is_l = 1{inner_filter}) __asof_j"
    )
    # ---- bare top-level * in the main select list → a.*, b.* --------
    head = tokens[: b_idx + 1]
    sel_at = [
        x
        for x, (kk, tt) in enumerate(head)
        if kk == "word" and tt.lower() == "select" and depths[x] == 0
    ]
    if sel_at:
        s0 = sel_at[-1]
        for x in range(s0 + 1, b_idx):
            if head[x] != ("op", "*") or depths[x] != 0:
                continue
            # only a PROJECTION star (directly after SELECT/DISTINCT/
            # ALL or a list comma) — a depth-0 `*` elsewhere is the
            # MULTIPLICATION operator (`a.price * 2`) and must stay
            pc = _prev_code(head, x)
            if pc < 0:
                continue
            pk, pt = head[pc]
            if (pk == "word" and pt.lower() in ("select", "distinct", "all")) or (
                pk, pt
            ) == ("op", ","):
                head = (
                    head[:x]
                    + [("word", f"{a_alias}.*, {b_alias}.*")]
                    + head[x + 1 :]
                )
                break
    pre = "".join(t for _, t in head)
    post = "".join(t for _, t in tokens[k:])
    return f"{pre} {rel} {post}"


def _subquery_order_keys(inner_tokens) -> str | None:
    """The key list of a subquery's FINAL top-level ORDER BY clause
    (text up to a top-level LIMIT/OFFSET or the end), or None."""
    depths = _depths(inner_tokens)
    n = len(inner_tokens)
    by_at = None
    for x in range(n):
        if (
            depths[x] == 0
            and inner_tokens[x][0] == "word"
            and inner_tokens[x][1].lower() == "order"
        ):
            y = _next_code(inner_tokens, x)
            if (
                y < n
                and inner_tokens[y][0] == "word"
                and inner_tokens[y][1].lower() == "by"
            ):
                by_at = y
    if by_at is None:
        return None
    start = _next_code(inner_tokens, by_at)
    end = n
    for x in range(start, n):
        if (
            depths[x] == 0
            and inner_tokens[x][0] == "word"
            and inner_tokens[x][1].lower() in ("limit", "offset")
        ):
            end = x
            break
    keys = "".join(t for _, t in inner_tokens[start:end]).strip()
    return keys or None


_POSITIONAL_HINT = (
    " — POSITIONAL JOIN pairs rows by scan position, which is "
    "UNDEFINED for a distributed scan; wrap each side in a subquery "
    "whose top level ends with ORDER BY <unique key> (optionally + "
    "LIMIT), e.g. (SELECT … FROM t ORDER BY id) a POSITIONAL JOIN "
    "(SELECT … FROM u ORDER BY id) b"
)


def _rewrite_positional_join(sql: str) -> str:
    """DuckDB ``a POSITIONAL JOIN b`` — rows paired by position, the
    shorter side padded with NULLs (the reference reaches this through
    raw statement passthrough, /root/reference/src/hooks/executor.rs:71).

    Distributed-determinism contract: "position" only exists under an
    explicit total order, so EACH side must be a subquery whose top
    level ends with ORDER BY (its keys are lifted into a
    ``row_number()`` window); anything else — a bare table, an
    unordered subquery — raises UnsupportedDialect with that guidance
    rather than pairing nondeterministically.  The rewrite:

        (SELECT _l AS a, _r AS b FROM
           (SELECT row_number() OVER (ORDER BY ka) AS _p,
                   struct(a.*) AS _l FROM (…) a) __ppl
           FULL OUTER JOIN
           (SELECT row_number() OVER (ORDER BY kb) AS _p,
                   struct(b.*) AS _r FROM (…) b) __ppr
           USING (_p)) __pos_j

    Each side's row rides as a STRUCT named by its alias (the ASOF
    union rewrite's namespace trick), so ``a.x`` / ``a.*`` resolve
    unchanged and a bare top-level ``*`` expands to ``a.*, b.*``.
    Scale note: the global row_number is a single-partition sort per
    side — inherent to the operator's order-defined semantics (DuckDB
    is single-node), not to the rewrite; keyed joins are the scale
    path.  Ties in the ORDER BY keys make pairing arbitrary in BOTH
    engines — use a unique key.
    """
    tokens = _tokenize(sql)
    depths = _depths(tokens)
    n = len(tokens)
    found = None
    for x, (kk, tt) in enumerate(tokens):
        if kk == "word" and tt.lower() == "positional":
            y = _next_code(tokens, x)
            if y < n and tokens[y][0] == "word" and tokens[y][1].lower() == "join":
                found = (x, y)
                break
    if found is None:
        return sql
    i, jkw = found
    d = depths[i]

    def _fail(msg: str):
        raise UnsupportedDialect("POSITIONAL JOIN: " + msg + _POSITIONAL_HINT)

    def _parse_side(start: int, stop: int, default_alias: str):
        """(sub_tokens, alias, end_idx) for a `(subquery) [AS] [alias]`
        relation beginning at `start`; loud error on a bare table."""
        if tokens[start] != ("op", "("):
            _fail("each side must be a parenthesized ordered subquery")
        depth, q = 0, start
        while q < stop:
            if tokens[q] == ("op", "("):
                depth += 1
            elif tokens[q] == ("op", ")"):
                depth -= 1
                if depth == 0:
                    break
            q += 1
        if q >= stop:
            _fail("unbalanced parentheses")
        sub = tokens[start + 1 : q]
        alias, end = default_alias, q
        nxt = _next_code(tokens, q)
        if (
            nxt < stop
            and tokens[nxt][0] == "word"
            and tokens[nxt][1].lower() == "as"
        ):
            nxt = _next_code(tokens, nxt)
        if nxt < stop and (
            tokens[nxt][0] == "qident"
            or (
                tokens[nxt][0] == "word"
                and tokens[nxt][1].lower() not in _KEYWORDS
                and tokens[nxt][1].lower() != "positional"
            )
        ):
            alias, end = tokens[nxt][1], nxt
        return sub, alias, end

    # ---- left side: scan back to FROM/comma at this depth ----------
    b_idx = -1
    for x in range(i - 1, -1, -1):
        if depths[x] == d and (
            (tokens[x][0] == "word" and tokens[x][1].lower() == "from")
            or tokens[x] == ("op", ",")
        ):
            b_idx = x
            break
    if b_idx < 0:
        _fail("could not locate the left relation")
    p = _next_code(tokens, b_idx)
    a_sub, a_alias, a_end = _parse_side(p, i, "__pl")
    if _next_code(tokens, a_end) != i:
        _fail("left side must be a single parenthesized subquery")
    # ---- right side ------------------------------------------------
    r_start = _next_code(tokens, jkw)
    if r_start >= n:
        _fail("missing right relation")
    b_sub, b_alias, b_end = _parse_side(r_start, n, "__pr")
    if a_alias.lower() == b_alias.lower():
        b_alias = b_alias + "_r"
    keys_a = _subquery_order_keys(a_sub)
    keys_b = _subquery_order_keys(b_sub)
    if keys_a is None or keys_b is None:
        _fail("each side must end with a top-level ORDER BY")
    a_txt = "".join(t for _, t in a_sub).strip()
    b_txt = "".join(t for _, t in b_sub).strip()
    rel = (
        f"(SELECT _l AS {a_alias}, _r AS {b_alias} FROM "
        f"(SELECT row_number() OVER (ORDER BY {keys_a}) AS _p, "
        f"struct({a_alias}.*) AS _l FROM ({a_txt}) {a_alias}) __ppl "
        f"FULL OUTER JOIN "
        f"(SELECT row_number() OVER (ORDER BY {keys_b}) AS _p, "
        f"struct({b_alias}.*) AS _r FROM ({b_txt}) {b_alias}) __ppr "
        f"USING (_p)) __pos_j"
    )
    # ---- bare top-level * in the select list → a.*, b.* ------------
    head = tokens[: b_idx + 1]
    sel_at = [
        x
        for x, (kk, tt) in enumerate(head)
        if kk == "word" and tt.lower() == "select" and depths[x] == d
    ]
    if sel_at:
        s0 = sel_at[-1]
        for x in range(s0 + 1, b_idx):
            if head[x] == ("op", "*") and depths[x] == d:
                pidx = _prev_code(head, x)
                pk, pt = head[pidx] if pidx >= 0 else ("", "")
                if (
                    pk == "word" and pt.lower() in ("select", "distinct", "all")
                ) or (pk, pt) == ("op", ","):
                    head = (
                        head[:x]
                        + [("word", f"{a_alias}.*, {b_alias}.*")]
                        + head[x + 1 :]
                    )
                    break
    pre = "".join(t for _, t in head)
    post = "".join(t for _, t in tokens[b_end + 1 :])
    # recurse: the statement may chain several positional joins
    return _rewrite_positional_join(f"{pre} {rel} {post}")


def _rewrite_asof_join(sql: str) -> str:
    """DuckDB ``a ASOF [LEFT] JOIN b [alias] ON eq-conds AND ineq`` →
    a Spark LATERAL subquery picking the nearest match:

        a, LATERAL (SELECT * FROM b alias WHERE <cond>
                    ORDER BY <b's ineq column> DESC|ASC LIMIT 1) alias
        a LEFT JOIN LATERAL (…) alias ON true          -- ASOF LEFT

    Semantics match DuckDB's: the single inequality bounds b's column
    and the closest b row per a row wins (DESC when b is bounded
    above, ASC when below).  The inequality must qualify b's column
    with b's alias — a clear error otherwise beats a silently wrong
    join.  Ties on the inequality column are broken arbitrarily in
    both engines (DuckDB picks an arbitrary row too).

    Plan note (tests/test_plans.py pins it): Catalyst decorrelates
    this into a distinct-timestamp DOMAIN join + WindowGroupLimit
    top-1 + hash join back — correct and bounded by |distinct probe
    ts| × |build|, the COMPATIBILITY plan for interactive use.  At
    100 TB use `operators/temporal.asof_join` (single-shuffle
    union+window) — the same reason the reference delegates ASOF to
    DuckDB's sorted-merge executor rather than a generic join.
    """
    tokens = _tokenize(sql)
    depths = _depths(tokens)
    out: list[tuple[str, str]] = []
    i = 0
    n = len(tokens)
    while i < n:
        kind, text = tokens[i]
        if not (kind == "word" and text.lower() == "asof" and depths[i] == 0):
            out.append(tokens[i])
            i += 1
            continue
        j = _next_code(tokens, i)
        left_join = False
        if j < n and tokens[j][1].lower() == "left":
            left_join = True
            j = _next_code(tokens, j)
        if j >= n or tokens[j][1].lower() != "join":
            out.append(tokens[i])
            i += 1
            continue
        j = _next_code(tokens, j)  # table name
        if j >= n or tokens[j][0] != "word":
            raise UnsupportedDialect("ASOF JOIN: expected a table name")
        b_name = tokens[j][1]
        j = _next_code(tokens, j)
        b_alias = b_name
        if j < n and tokens[j][0] == "word" and tokens[j][1].lower() == "as":
            j = _next_code(tokens, j)
        if (
            j < n
            and tokens[j][0] == "word"
            and tokens[j][1].lower() != "on"
        ):
            b_alias = tokens[j][1]
            j = _next_code(tokens, j)
        if j >= n or tokens[j][1].lower() != "on":
            raise UnsupportedDialect("ASOF JOIN: expected ON <condition>")
        cond_start = _next_code(tokens, j)
        k = cond_start
        while k < n:
            tk, tt = tokens[k]
            if (
                depths[k] == 0
                and tk == "word"
                and tt.lower() in _ASOF_STOP
            ):
                break
            k += 1
        cond_toks = tokens[cond_start:k]
        cond = "".join(t for _, t in cond_toks).strip()
        # locate the single inequality and b's operand within it
        order_col, direction = None, None
        for ci in range(len(cond_toks)):
            ck, ct = cond_toks[ci]
            if ck == "op" and ct in ("<", ">"):
                # operands: walk out one qualified column (name or
                # name.name…) on each side, stopping at keywords/ops
                def _qualcol(idx, step):
                    def _code(x):
                        while 0 <= x < len(cond_toks) and cond_toks[x][0] in (
                            "ws",
                            "comment",
                        ):
                            x += step
                        return x

                    parts = []
                    x = _code(idx)
                    while 0 <= x < len(cond_toks):
                        xk, xt = cond_toks[x]
                        if xk != "word" or xt.lower() in _KEYWORDS:
                            break
                        parts.append(xt)
                        y = _code(x + step)
                        if 0 <= y < len(cond_toks) and cond_toks[y] == (
                            "op",
                            ".",
                        ):
                            x = _code(y + step)
                            parts.append(".")
                            continue
                        break
                    return "".join(parts[::-1] if step < 0 else parts)

                nxt = ci + 1
                if nxt < len(cond_toks) and cond_toks[nxt] == ("op", "="):
                    nxt += 1
                lhs = _qualcol(ci - 1, -1)
                rhs = _qualcol(nxt, +1)
                b_pref = b_alias + "."
                if lhs.startswith(b_pref) and not rhs.startswith(b_pref):
                    order_col = lhs
                    direction = "DESC" if ct == "<" else "ASC"
                elif rhs.startswith(b_pref) and not lhs.startswith(b_pref):
                    order_col = rhs
                    direction = "DESC" if ct == ">" else "ASC"
                else:
                    raise UnsupportedDialect(
                        "ASOF JOIN: the inequality must qualify exactly "
                        f"one side with the joined alias {b_alias!r} "
                        f"(got {lhs!r} {ct} {rhs!r})"
                    )
                break
        if order_col is None:
            raise UnsupportedDialect(
                "ASOF JOIN: ON must contain one range inequality "
                "(<, <=, > or >=)"
            )
        inner_from = b_name if b_alias == b_name else f"{b_name} {b_alias}"
        lateral = (
            f"LATERAL (SELECT * FROM {inner_from} WHERE {cond} "
            f"ORDER BY {order_col} {direction} LIMIT 1) {b_alias}"
        )
        if left_join:
            repl = f" LEFT JOIN {lateral} ON true "
        else:
            repl = f" , {lateral} "
        out.append(("word", repl))
        i = k
    return "".join(t for _, t in out)

#: DuckDB FROM-first statements: `FROM t`, `FROM t SELECT a WHERE b` …
_FROM_FIRST_RE = re.compile(r"^\s*(?:--[^\n]*\n\s*)*from\b", re.IGNORECASE)

#: clause keywords that end a FROM part / a select list at depth 0
_CLAUSE_WORDS = frozenset(
    "select where group having order limit offset qualify union "
    "intersect except window".split()
)


def _rewrite_from_first(sql: str) -> str:
    """DuckDB's FROM-first syntax → standard SELECT syntax.

    `FROM t`                    → `SELECT * FROM t`
    `FROM t WHERE c`            → `SELECT * FROM t WHERE c`
    `FROM t SELECT a, b WHERE c`→ `SELECT a, b FROM t WHERE c`

    Top-level statements only (the reference's users type these at the
    psql prompt; FROM-first inside CTE bodies/subqueries is out of
    scope and passes through to a normal parse error).  The FROM part
    runs to the first depth-0 clause keyword; when that keyword is
    SELECT, its select list (up to the next depth-0 clause keyword) is
    hoisted in front and the remaining clauses keep their order.
    """
    tokens = _tokenize(sql)
    depths = _depths(tokens)
    first = _next_code(tokens, -1)
    if first >= len(tokens) or tokens[first][1].lower() != "from":
        return sql

    def _find_clause(start: int, words: frozenset) -> int:
        for j in range(start, len(tokens)):
            if (
                depths[j] == 0
                and tokens[j][0] == "word"
                and tokens[j][1].lower() in words
            ):
                return j
        return len(tokens)

    sel = _find_clause(first + 1, frozenset(("select",)))
    if sel == len(tokens):
        # no SELECT: implicit `SELECT *` in front of the whole rest
        rest = "".join(t for _, t in tokens[first + 1 :])
        return f"SELECT * FROM {rest.strip()}"
    from_part = "".join(t for _, t in tokens[first + 1 : sel]).strip()
    list_end = _find_clause(sel + 1, _CLAUSE_WORDS)
    select_list = "".join(t for _, t in tokens[sel + 1 : list_end]).strip()
    trailing = "".join(t for _, t in tokens[list_end:]).strip()
    out = f"SELECT {select_list} FROM {from_part}"
    return f"{out} {trailing}" if trailing else out


def rewrite_pg(
    sql: str, asof_union: bool = True, keyword_commas: bool = False
) -> str:
    """Rewrite Postgres/DuckDB-dialect constructs to Spark SQL.

    A no-op (returns the input object) when the query contains neither
    ``::`` nor ``->`` nor a QUALIFY/EXCLUDE keyword — plain Spark SQL
    never pays tokenization cost.

    ``asof_union=False`` forces ASOF JOIN statements onto the
    correlated-LATERAL compatibility rewrite instead of the default
    union+window routing (Engine.sql retries with it when the routed
    plan fails analysis, e.g. on unqualified outer column refs).

    ``keyword_commas=True`` additionally removes commas directly
    preceding clause keywords (DuckDB trailing-comma tolerance) —
    ambiguous when the keyword could be a non-reserved column name,
    so Engine.sql passes it only on a parse-failure retry.
    """
    if _FROM_FIRST_RE.match(sql):
        sql = _rewrite_from_first(sql)
    if (
        "::" not in sql
        and "->" not in sql
        and "[" not in sql
        and "{" not in sql
        and not _EXTRA_RE.search(sql)
    ):
        return sql
    if re.search(r"\basof\s+(left\s+)?join\b", sql, re.IGNORECASE):
        routed = _rewrite_asof_union(sql) if asof_union else None
        sql = routed if routed is not None else _rewrite_asof_join(sql)
    if re.search(r"\bpositional\s+join\b", sql, re.IGNORECASE):
        sql = _rewrite_positional_join(sql)
    if "[" in sql:
        # list comprehensions / literals FIRST, then re-tokenize: the
        # generated transform()/filter() text may still carry ::casts
        # and -> arrows that the later stages rewrite
        sql = "".join(
            t for _, t in _rewrite_list_comprehensions(_tokenize(sql))
        )
        # slices next, ALSO re-tokenized: the sliced operand/bounds can
        # carry fn aliases / ::casts that later stages must still see
        # Both passes bake their inner token span as TEXT into the
        # replacement, so a nested subscript (`a[b[1]]`, `ARRAY[l[1]]`,
        # slice bounds like `a[b[1]:2]`) survives one pass untouched —
        # exactly the silent 0-vs-1-based divergence the pass exists
        # to prevent.  Re-tokenizing the output re-exposes the baked
        # inner bracket, so running each pass to FIXPOINT rewrites
        # arbitrarily nested subscripts; every rewrite removes one
        # bracket pair and introduces none, so this terminates (the
        # cap only guards a future non-contracting rewrite).
        for _ in range(32):
            new = sql
            for _pass in (_rewrite_array_slices, _rewrite_plain_subscripts):
                new = "".join(t for _, t in _pass(_tokenize(new)))
            if new == sql:
                break
            sql = new
    if "{" in sql:
        # struct literals AFTER comprehensions (a struct inside a
        # rewritten comprehension body surfaces on this re-tokenize)
        sql = "".join(
            t for _, t in _rewrite_struct_literals(_tokenize(sql))
        )
    tokens = _tokenize(sql)
    tokens = _rewrite_using_sample(tokens)
    tokens = _rewrite_arrows(tokens)
    tokens = _rewrite_casts(tokens)
    tokens = _rewrite_exclude(tokens)
    tokens = _rewrite_star_replace(tokens)
    tokens = _rewrite_distinct_on(tokens)
    tokens = _rewrite_qualify(tokens)
    tokens = _rewrite_ignore_nulls(tokens)
    tokens = _rewrite_fn_aliases(tokens)
    tokens = _rewrite_generate_series(tokens)
    tokens = _rewrite_trailing_commas(tokens, keywords=keyword_commas)
    return "".join(t for _, t in tokens)


# ------------------------------------------------------------------ #
# DuckDB table functions in raw SQL: read_parquet('...') / FROM 'x.csv'
# ------------------------------------------------------------------ #

#: table-function name → engine source format
TABLE_FUNCTIONS: dict[str, str] = {
    "read_parquet": "parquet",
    "parquet_scan": "parquet",
    "read_csv": "csv",
    "read_csv_auto": "csv",
    "read_json": "json",
    "read_json_auto": "json",
    "read_ndjson": "json",
    "read_ndjson_auto": "json",
    "delta_scan": "delta",
    "iceberg_scan": "iceberg",
    "st_read": "spatial",
    "read_text": "text",
}

#: bare FROM 'file.ext' extension → format
_EXT_FORMAT = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".csv.gz": "csv",
    ".json": "json",
    ".ndjson": "json",
    ".jsonl": "json",
    ".geojson": "spatial",
    ".xlsx": "xlsx",
}

#: FROM-context introducers for a bare file-path table
_FROM_WORDS = frozenset(("from", "join"))


def _unquote(s: str) -> str:
    return s[1:-1].replace("''", "'")


def _parse_tf_args(tokens, i):
    """Parse ``(`` args ``)`` starting at the ``(`` token index.
    Returns (files, options, end_index) — files from the leading string
    literal or [list, of, literals]; named ``key = literal`` options
    after it.  Raises ValueError on shapes we don't support."""
    assert tokens[i] == ("op", "(")
    j = _next_code(tokens, i)
    files: list[str] = []
    if j < len(tokens) and tokens[j][0] == "string":
        files = [_unquote(tokens[j][1])]
        j = _next_code(tokens, j)
    elif j < len(tokens) and tokens[j] == ("op", "["):
        j = _next_code(tokens, j)
        while j < len(tokens) and tokens[j][0] == "string":
            files.append(_unquote(tokens[j][1]))
            j = _next_code(tokens, j)
            if j < len(tokens) and tokens[j] == ("op", ","):
                j = _next_code(tokens, j)
        if j >= len(tokens) or tokens[j] != ("op", "]"):
            raise ValueError("unterminated file list in table function")
        j = _next_code(tokens, j)
    else:
        raise ValueError("table function requires a file path literal")
    opts: dict = {}
    while j < len(tokens) and tokens[j] == ("op", ","):
        j = _next_code(tokens, j)
        if j >= len(tokens) or tokens[j][0] != "word":
            raise ValueError("expected option name in table function")
        key = tokens[j][1].lower()
        j = _next_code(tokens, j)
        if j < len(tokens) and tokens[j][1] in ("=", ":="):
            j = _next_code(tokens, j)
        else:
            raise ValueError(f"option {key} missing '='")
        if j >= len(tokens):
            raise ValueError(f"option {key} missing value")
        opts[key], j = _parse_tf_value(tokens, j)
    if j >= len(tokens) or tokens[j] != ("op", ")"):
        raise ValueError("unterminated table function call")
    return files, opts, j


def _parse_tf_value(tokens, j):
    """One table-function option VALUE starting at token ``j`` →
    (python value, next code index).  Beyond scalar literals this
    accepts DuckDB's composite option forms: ``['a', 'b']`` lists
    (e.g. ``names=[...]``), ``{'col': 'TYPE', …}`` struct literals
    (``columns={...}``), negative numbers (``skip=-1``), and NULL."""
    k, t = tokens[j]
    if k == "string":
        return _unquote(t), _next_code(tokens, j)
    if k == "number":
        return (float(t) if "." in t else int(t)), _next_code(tokens, j)
    if (k, t) == ("op", "-"):
        j2 = _next_code(tokens, j)
        if j2 < len(tokens) and tokens[j2][0] == "number":
            t2 = tokens[j2][1]
            return (
                -(float(t2) if "." in t2 else int(t2)),
                _next_code(tokens, j2),
            )
        raise ValueError("dangling '-' in table-function option")
    if k == "word" and t.lower() in ("true", "false"):
        return t.lower() == "true", _next_code(tokens, j)
    if k == "word" and t.lower() == "null":
        return None, _next_code(tokens, j)
    if k == "word" and t.lower() == "named_struct":
        # rewrite_pg runs before table-function extraction, so a
        # `columns={'a': 'INT'}` struct literal arrives here already
        # rewritten to named_struct('a', 'INT', …) — parse it back
        j2 = _next_code(tokens, j)
        if j2 >= len(tokens) or tokens[j2] != ("op", "("):
            raise ValueError("bad named_struct option value")
        d: dict = {}
        j2 = _next_code(tokens, j2)
        while j2 < len(tokens) and tokens[j2] != ("op", ")"):
            dkey, j2 = _parse_tf_value(tokens, j2)
            if j2 >= len(tokens) or tokens[j2] != ("op", ","):
                raise ValueError("bad named_struct option value")
            j2 = _next_code(tokens, j2)
            d[str(dkey)], j2 = _parse_tf_value(tokens, j2)
            if j2 < len(tokens) and tokens[j2] == ("op", ","):
                j2 = _next_code(tokens, j2)
        if j2 >= len(tokens):
            raise ValueError("unterminated named_struct option value")
        return d, _next_code(tokens, j2)
    if (k, t) == ("op", "["):
        vals = []
        j = _next_code(tokens, j)
        while j < len(tokens) and tokens[j] != ("op", "]"):
            v, j = _parse_tf_value(tokens, j)
            vals.append(v)
            if j < len(tokens) and tokens[j] == ("op", ","):
                j = _next_code(tokens, j)
        if j >= len(tokens):
            raise ValueError("unterminated list option value")
        return vals, _next_code(tokens, j)
    if (k, t) == ("op", "{"):
        d: dict = {}
        j = _next_code(tokens, j)
        while j < len(tokens) and tokens[j] != ("op", "}"):
            kk, kt = tokens[j]
            if kk == "string":
                dkey = _unquote(kt)
            elif kk in ("word", "qident"):
                dkey = kt.strip('"')
            else:
                raise ValueError(f"bad struct option key {kt!r}")
            j = _next_code(tokens, j)
            if j >= len(tokens) or tokens[j][1] != ":":
                raise ValueError(f"struct option key {dkey!r} missing ':'")
            j = _next_code(tokens, j)
            d[dkey], j = _parse_tf_value(tokens, j)
            if j < len(tokens) and tokens[j] == ("op", ","):
                j = _next_code(tokens, j)
        if j >= len(tokens):
            raise ValueError("unterminated struct option value")
        return d, _next_code(tokens, j)
    raise ValueError(f"unsupported option value: {t!r}")


def extract_table_functions(sql: str):
    """Rewrite DuckDB table-function FROM targets and bare file-path
    tables into generated view names.

    Returns (rewritten_sql, attachments) where attachments is a list of
    (view_name, files, format, options).  The caller (Engine.sql)
    registers each as a temp view before executing.  Returns the input
    unchanged when nothing matches.
    """
    low = sql.lower()
    if not any(fn in low for fn in TABLE_FUNCTIONS) and not any(
        e + "'" in low for e in _EXT_FORMAT
    ):
        return sql, []
    tokens = _tokenize(sql)
    attachments = []
    out: list[tuple[str, str]] = []
    i = 0
    while i < len(tokens):
        kind, text = tokens[i]
        if (
            kind == "word"
            and text.lower() in TABLE_FUNCTIONS
        ):
            n = _next_code(tokens, i)
            if n < len(tokens) and tokens[n] == ("op", "("):
                try:
                    files, opts, end = _parse_tf_args(tokens, n)
                except ValueError:
                    out.append(tokens[i])
                    i += 1
                    continue
                name = f"__tf_{len(attachments)}"
                attachments.append(
                    (name, files, TABLE_FUNCTIONS[text.lower()], opts)
                )
                out.append(("word", name))
                i = end + 1
                continue
        if (
            kind == "string"
            and out
            and any(
                _prev_word(out) == w for w in _FROM_WORDS
            )
        ):
            path = _unquote(text)
            fmt = _path_format(path)
            if fmt is not None:
                name = f"__tf_{len(attachments)}"
                attachments.append((name, [path], fmt, {}))
                out.append(("word", name))
                i += 1
                continue
        out.append(tokens[i])
        i += 1
    if not attachments:
        return sql, []
    return "".join(t for _, t in out), attachments


def _prev_word(out) -> str | None:
    for k, t in reversed(out):
        if k in ("ws", "comment"):
            continue
        return t.lower() if k == "word" else None
    return None


def _path_format(path: str) -> str | None:
    p = path.lower()
    for ext, fmt in _EXT_FORMAT.items():
        if p.endswith(ext):
            return fmt
    return None


# ------------------------------------------------------------------ #
# DuckDB function-name aliases (exact-semantics pairs only)
# ------------------------------------------------------------------ #

#: DuckDB name → Spark name.  Only functions whose argument order AND
#: semantics match exactly; anything with divergent formats (strftime),
#: ambiguous typing (len), or different null behavior stays out — a
#: clear unresolved-function error beats a silently different answer.
FN_ALIASES: dict[str, str] = {
    "list_min": "array_min",
    "list_max": "array_max",
    "list_distinct": "array_distinct",
    "list_contains": "array_contains",
    "list_has": "array_contains",
    "list_sort": "sort_array",
    "list_filter": "filter",
    "list_transform": "transform",
    "list_value": "array",
    "list_pack": "array",
    "list_append": "array_append",
    "list_prepend": "array_prepend",
    "list_unique": "array_size",  # count of distinct: see note below
    "array_to_string": "array_join",
    "regexp_matches": "regexp_like",
    "string_to_array": "split",
    "starts_with": "startswith",
    "ends_with": "endswith",
    # DuckDB arg extremum aggregates ≡ Spark max_by/min_by: value of
    # arg 1 at the max/min of arg 2; ties are unspecified in BOTH
    # engines, so the pair is exact on the specified surface
    "arg_max": "max_by",
    "arg_min": "min_by",
    "argmax": "max_by",
    "argmin": "min_by",
    # unnest in SELECT position (one row per element, empty/NULL arrays
    # produce no rows in BOTH engines); Spark's explode also works as a
    # table-valued function, covering DuckDB's FROM unnest([...]) form
    "unnest": "explode",
}
# Deliberately absent: list_unique (counts DISTINCT; Spark array_size
# counts all), list_position (DuckDB returns NULL when missing; Spark
# returns 0), len (array size vs string length ambiguity), strftime/
# strptime (format-string languages differ).
del FN_ALIASES["list_unique"]


def _rewrite_generate_series(
    tokens: list[tuple[str, str]]
) -> list[tuple[str, str]]:
    """Relation-position DuckDB ``generate_series(a, b[, step])`` —
    INCLUSIVE bounds, ints or timestamps+interval — becomes
    ``(SELECT explode(sequence(a, b[, step])) AS generate_series)``:
    Spark's sequence() shares the inclusive-bounds contract exactly.
    Only FROM/JOIN/comma position rewrites (SELECT-position
    generate_series returns a LIST in DuckDB — different semantics,
    deliberately untouched)."""
    out = list(tokens)
    i = 0
    while i < len(out):
        kind, text = out[i]
        if kind == "word" and text.lower() == "generate_series":
            depths = _depths(out)
            p = _prev_code(out, i)
            prev_ok = p >= 0 and (
                (
                    out[p] == ("op", ",")
                    and _comma_in_from_list(out, depths, p)
                )
                or (
                    out[p][0] == "word"
                    and out[p][1].lower() in ("from", "join")
                )
            )
            n = _next_code(out, i)
            if n < len(out) and out[n] == ("op", "("):
                if prev_ok:
                    d, j = 0, n
                    while j < len(out):
                        if out[j] == ("op", "("):
                            d += 1
                        elif out[j] == ("op", ")"):
                            d -= 1
                            if d == 0:
                                break
                        j += 1
                    args = "".join(t for _, t in out[n + 1: j])
                    repl = _tokenize(
                        "(SELECT explode(sequence("
                        f"{args})) AS generate_series)"
                    )
                    out = out[:i] + repl + out[j + 1:]
                    i += len(repl)
                    continue
                # expression position (DuckDB returns a LIST there) —
                # Spark's sequence() has the same inclusive-bounds
                # array semantics
                out[i] = ("word", "sequence")
        i += 1
    return out


#: clause keywords that delimit relation-position detection
_CLAUSE_KWS = frozenset(
    """select from where group by order having limit offset join on using
    union except intersect qualify window when then else set""".split()
)


def _comma_in_from_list(
    toks: list[tuple[str, str]], depths: list[int], idx: int
) -> bool:
    """True when the comma at ``idx`` separates FROM-list relations:
    the nearest preceding clause keyword at the SAME depth is
    FROM/JOIN/ON/USING.  A SELECT-list (or GROUP BY/ORDER BY) comma
    must never put the following call in relation position — that
    would rewrite expression-position table-function names (r7
    ADVICE)."""
    d0 = depths[idx]
    for q in range(idx - 1, -1, -1):
        if depths[q] != d0 or toks[q][0] != "word":
            continue
        w = toks[q][1].lower()
        if w in _CLAUSE_KWS:
            return w in ("from", "join", "on", "using")
    return False


#: clause keywords a DuckDB trailing comma may directly precede
_TRAILING_COMMA_NEXT = frozenset(
    """from where group order having limit offset union except intersect
    qualify window""".split()
)


def _rewrite_trailing_commas(
    tokens: list[tuple[str, str]], keywords: bool = False
) -> list[tuple[str, str]]:
    """DuckDB tolerates trailing commas in SELECT lists, call
    argument lists, GROUP BY/ORDER BY lists etc.; Spark rejects them
    all.  A comma whose next code token is ``)`` or end-of-input is
    NEVER meaningful in Spark SQL — removing those unconditionally
    can only turn a syntax error into the intended query.

    A comma before a CLAUSE KEYWORD is ambiguous: several of those
    words are non-reserved in Spark (``window``, ``offset``, …), so
    ``SELECT a, window FROM t`` is a valid projection of a column
    named ``window`` — deleting the comma would silently re-parse it
    as an alias (r7 ADVICE).  The ``keywords=True`` tier removes
    those too; Engine.sql enables it ONLY as a retry after the
    unmodified statement failed to parse, when no valid reading
    existed in the first place."""
    out = list(tokens)
    i = 0
    while i < len(out):
        if out[i] == ("op", ","):
            n = _next_code(out, i)
            nxt = out[n] if n < len(out) else None
            if (
                nxt is None
                or nxt == ("op", ")")
                or (
                    keywords
                    and nxt[0] == "word"
                    and nxt[1].lower() in _TRAILING_COMMA_NEXT
                )
            ):
                del out[i]
                continue
        i += 1
    return out


def _rewrite_ignore_nulls(
    tokens: list[tuple[str, str]]
) -> list[tuple[str, str]]:
    """DuckDB/Postgres put the null-treatment clause INSIDE the window
    function's parens — ``last_value(v IGNORE NULLS) OVER …`` — while
    Spark requires it after them: ``last_value(v) IGNORE NULLS OVER …``.
    Token-level move: an ``IGNORE|RESPECT NULLS`` immediately before a
    closing paren hops to just after it.  Spark-syntax text (clause
    already outside the parens) never matches the pattern and passes
    through untouched."""
    out = list(tokens)
    i = 0
    while i < len(out):
        kind, text = out[i]
        if kind == "word" and text.lower() in ("ignore", "respect"):
            j = _next_code(out, i)
            k = _next_code(out, j) if j < len(out) else len(out)
            if (
                j < len(out)
                and out[j][0] == "word"
                and out[j][1].lower() == "nulls"
                and k < len(out)
                and out[k][1] == ")"
            ):
                clause = f" {text.upper()} NULLS"
                # drop the clause tokens (and any gap between them)
                del out[i:k]
                # removal shifted the ')' to position i
                out.insert(i + 1, ("ws", clause))
                # strip a doubled space left before the ')'
                if i > 0 and out[i - 1][0] == "ws":
                    del out[i - 1]
                continue
        i += 1
    return out


def _rewrite_fn_aliases(tokens: list[tuple[str, str]]) -> list[tuple[str, str]]:
    out = list(tokens)
    for i, (kind, text) in enumerate(out):
        if kind != "word":
            continue
        alias = FN_ALIASES.get(text.lower())
        if alias is None:
            continue
        n = _next_code(out, i)
        if n >= len(out) or out[n] != ("op", "("):
            continue  # not a call
        p = _prev_code(out, i)
        if p >= 0 and out[p] == ("op", "."):
            continue  # qualified: someone else's namespace
        out[i] = ("word", alias)
    return out


# ------------------------------------------------------------------ #
# DuckDB COLUMNS('regex') star-macro — schema-aware, so the expansion
# runs in Engine.sql (which can resolve a table's column list), not in
# the schema-less rewrite_pg pass.
# ------------------------------------------------------------------ #

_COLUMNS_RE = re.compile(r"\bcolumns\s*\(", re.IGNORECASE)


def expand_columns_macro(sql: str, resolve) -> str:
    """Expand DuckDB ``COLUMNS('regex')`` / ``COLUMNS(*)`` select-list
    macros.

    ``resolve(table_name) -> list[str]`` supplies the column list.
    Supported: string-literal regex (partial match, DuckDB's
    regexp_matches semantics) or ``*`` (every column — the lambda-less
    form), select lists over EXACTLY ONE table
    (joins are ambiguous without full binder machinery — rejected
    loudly), bare items (aliased to the column name, DuckDB's naming)
    and wrapped items like ``min(COLUMNS('.*'))`` (one copy per match;
    Spark's auto-naming applies — alias explicitly for stable names).
    """
    if not _COLUMNS_RE.search(sql):
        return sql
    while True:
        tokens = _tokenize(sql)
        depths = _depths(tokens)
        hit = None
        for i, (k, t) in enumerate(tokens):
            if k == "word" and t.lower() == "columns":
                n = _next_code(tokens, i)
                if n < len(tokens) and tokens[n] == ("op", "("):
                    s = _next_code(tokens, n)
                    c = _next_code(tokens, s) if s < len(tokens) else len(tokens)
                    if (
                        s < len(tokens)
                        # COLUMNS('regex') or COLUMNS(*) = every column
                        and (
                            tokens[s][0] == "string"
                            or tokens[s] == ("op", "*")
                        )
                        and c < len(tokens)
                        and tokens[c] == ("op", ")")
                    ):
                        hit = (i, n, s, c)
                        break
        if hit is None:
            return sql
        i, n, s, c = hit
        pattern = (
            "" if tokens[s] == ("op", "*")  # matches every column
            else tokens[s][1][1:-1].replace("''", "'")
        )
        # enclosing SELECT: nearest preceding `select` at the minimum
        # depth seen on the way back (skips subqueries that closed
        # before the macro); the macro itself may sit deeper, nested
        # inside a call like max(COLUMNS('...'))
        sel = None
        mind = depths[i]
        for j in range(i - 1, -1, -1):
            mind = min(mind, depths[j])
            if (
                tokens[j][0] == "word"
                and tokens[j][1].lower() == "select"
                and depths[j] <= mind
            ):
                sel = j
                break
        frm = None
        if sel is not None:
            d = depths[sel]
            mind = depths[i]
            for j in range(i + 1, len(tokens)):
                mind = min(mind, depths[j])
                if mind < d:
                    break
                if (
                    depths[j] == d
                    and tokens[j][0] == "word"
                    and tokens[j][1].lower() == "from"
                ):
                    frm = j
                    break
        if sel is None or frm is None:
            raise ValueError(
                "COLUMNS(...) must appear in a select list with a FROM"
            )
        # exactly one table: FROM <name> [alias], no joins/commas at d
        tn = _next_code(tokens, frm)
        if tn >= len(tokens) or tokens[tn][0] not in ("word", "qident"):
            raise ValueError(
                "COLUMNS(...) needs a plain `FROM table` (subquery/file "
                "sources: alias them as a view first)"
            )
        table = tokens[tn][1].strip('"')
        # absorb qualified names: db.t / catalog.db.t
        while True:
            dot = _next_code(tokens, tn)
            if dot < len(tokens) and tokens[dot] == ("op", "."):
                nxt = _next_code(tokens, dot)
                if nxt < len(tokens) and tokens[nxt][0] in ("word", "qident"):
                    table += "." + tokens[nxt][1].strip('"')
                    tn = nxt
                    continue
            break
        j = tn + 1
        while j < len(tokens):
            if depths[j] < d or (depths[j] == d and tokens[j] == ("op", ")")):
                break
            k2, t2 = tokens[j]
            if depths[j] == d and (
                (k2 == "op" and t2 == ",")
                or (k2 == "word" and t2.lower() == "join")
            ):
                raise ValueError(
                    "COLUMNS(...) over joins is ambiguous — project each "
                    "side first"
                )
            if depths[j] == d and k2 == "word" and t2.lower() in (
                "where", "group", "order", "limit", "qualify", "having",
                # set operators END this select's scope — the macro's
                # own select still reads exactly one table
                "union", "intersect", "except",
            ):
                break
            j += 1
        cols = [col for col in resolve(table) if re.search(pattern, col)]
        if not cols:
            raise ValueError(
                f"COLUMNS('{pattern}') matches no column of {table}"
            )
        # select-list item boundaries around the macro; the first item
        # starts AFTER any DISTINCT/ALL modifier (replicating the
        # modifier per expansion copy would be invalid SQL)
        start = sel + 1
        first = _next_code(tokens, sel)
        if (
            first < i
            and tokens[first][0] == "word"
            and tokens[first][1].lower() in ("distinct", "all")
        ):
            start = first + 1
        for j in range(i - 1, sel, -1):
            if depths[j] == d and tokens[j] == ("op", ","):
                start = j + 1
                break
        end = frm
        for j in range(c + 1, frm):
            if depths[j] == d and tokens[j] == ("op", ","):
                end = j
                break
        item = tokens[start:end]
        macro_a, macro_b = i - start, c - start  # span within item
        bare = all(
            t[0] in ("ws", "comment")
            for t in item[:macro_a] + item[macro_b + 1 :]
        )
        pieces = []
        for col in cols:
            rep = (
                item[:macro_a]
                + [("qident", f"`{col}`")]
                + item[macro_b + 1 :]
            )
            text = "".join(t for _, t in rep).strip()
            pieces.append(f"{text} AS `{col}`" if bare else text)
        sql = (
            "".join(t for _, t in tokens[:start])
            + " " + ", ".join(pieces) + " "
            + "".join(t for _, t in tokens[end:])
        )
