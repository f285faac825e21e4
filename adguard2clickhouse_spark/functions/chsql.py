"""ClickHouse-SQL compatibility layer: run the reference's own MV SQL
on Spark, near-verbatim.

A user of the reference (/root/reference/README.md:24-189) owns seven
materialized-view SELECT bodies written in ClickHouse dialect —
``splitByChar``, ``arrayRotateRight(...)[1]`` with 1-based indexing,
``toStartOfInterval(x, toIntervalMinute(10))``, ``isIPv4String`` — and
the brief's bar is that they can switch engines without rewriting
them. This module closes that last inch of parity:

- :func:`register_clickhouse_functions` creates Spark SQL *scalar SQL
  UDFs* (pure SQL bodies — they inline into Catalyst and stay inside
  whole-stage codegen; nothing here is a Python UDF) for the
  ClickHouse function names the reference uses.
- :func:`transpile` performs the two rewrites SQL UDFs cannot express:
  1-based postfix indexing ``expr[n]`` → ``element_at(expr, n)``
  (ClickHouse arrays are 1-based; Spark ``expr[n]`` is 0-based, so
  leaving the syntax alone would be silently off by one), database
  prefixes (``AdGuardHome.log2`` → ``log2``), and array ``length(``
  → ``size(`` (scoped: in this dialect subset ``length`` is applied
  to arrays; Spark's ``length`` is string-only).
- :func:`parse_mv_ddl` extracts, from the reference's verbatim DDL
  text, each materialized view's SELECT body plus the summing keys
  from the target table's ``ORDER BY`` — turning a ClickHouse
  ``SummingMergeTree + MV`` pair into the equivalent batch aggregate
  (``SELECT <body> → GROUP BY keys → sum(measures)``), i.e. exactly
  the contract our native aggregates and the streaming summing sinks
  implement.

``tests/test_chsql.py`` runs the reference's MV bodies, quoted
verbatim from README.md (cited per-view), against the same log2 frame
as the native operators and asserts row-set equality — the drop-in
claim, executed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adguard2clickhouse_spark.functions.net import IPV4_RE, IPV6_RE


def _sql_quote_regex(r: str) -> str:
    return r.replace("\\", "\\\\").replace("'", "''")


# Scalar SQL UDFs: bodies are pure Spark SQL, so Catalyst inlines them
# (no Python, no JVM registration, codegen-friendly).
_FUNCTION_DDL = [
    # splitByChar: literal separator (\Q..\E quoting), keeps empty
    # trailing fields like ClickHouse.
    "CREATE OR REPLACE TEMPORARY FUNCTION splitByChar(c STRING, s STRING) "
    "RETURNS ARRAY<STRING> RETURN split(s, concat('\\\\Q', c, '\\\\E'))",
    # arrayRotateRight for the reference's arity (n >= 0).
    "CREATE OR REPLACE TEMPORARY FUNCTION arrayRotateRight(a ARRAY<STRING>, n INT) "
    "RETURNS ARRAY<STRING> RETURN CASE WHEN size(a) = 0 THEN a ELSE "
    "concat(slice(a, size(a) - (n % size(a)) + 1, n % size(a)), "
    "slice(a, 1, size(a) - (n % size(a)))) END",
    f"CREATE OR REPLACE TEMPORARY FUNCTION isIPv4String(s STRING) "
    f"RETURNS BOOLEAN RETURN s rlike '{_sql_quote_regex(IPV4_RE)}'",
    f"CREATE OR REPLACE TEMPORARY FUNCTION isIPv6String(s STRING) "
    f"RETURNS BOOLEAN RETURN s rlike '{_sql_quote_regex(IPV6_RE)}'",
    # toIntervalMinute(n) carries seconds; toStartOfInterval floors to
    # the bucket (identical to functions/time.py::to_start_of_interval).
    "CREATE OR REPLACE TEMPORARY FUNCTION toIntervalMinute(n INT) "
    "RETURNS INT RETURN n * 60",
    "CREATE OR REPLACE TEMPORARY FUNCTION toStartOfInterval(ts TIMESTAMP, secs INT) "
    "RETURNS TIMESTAMP RETURN timestamp_seconds((unix_seconds(ts) div secs) * secs)",
]


def register_clickhouse_functions(spark: SparkSession) -> None:
    for ddl in _FUNCTION_DDL:
        spark.sql(ddl)


def _in_string(text: str, pos: int) -> bool:
    # count unescaped quotes before pos; odd = inside a literal
    # ('' is the SQL escape — each pair toggles twice, net even)
    return text.count("'", 0, pos) % 2 == 1


def _sub_outside_strings(pattern: str, repl: str, text: str) -> str:
    """re.sub that skips matches inside single-quoted SQL literals —
    every textual rewrite in this module goes through here so a
    function name inside a string constant is never rewritten."""
    out = []
    last = 0
    for m in re.finditer(pattern, text):
        if _in_string(text, m.start()):
            continue
        out.append(text[last : m.start()])
        out.append(m.expand(repl))
        last = m.end()
    out.append(text[last:])
    return "".join(out)


def _rewrite_indexing(sql: str) -> str:
    """``expr[n]`` → ``element_at(expr, n)`` (ClickHouse 1-based;
    negative n counts from the end in BOTH dialects — ``arr[-1]`` is
    the last element in ClickHouse and in ``element_at``, so the same
    rewrite is exact for it; left as raw ``[n]`` it would silently
    evaluate 0-based).

    Finds every ``[digits]`` postfix OUTSIDE single-quoted string
    literals and back-scans the balanced expression it applies to: a
    closing paren walks to its matching opener plus any preceding
    function identifier; otherwise a plain identifier/qualified name.
    Terminates because each rewrite removes one bracket pair
    (``a[1][2]`` resolves inside-out to nested element_at)."""

    in_string = _in_string
    out = sql
    pat = re.compile(r"\[(-?\d+)\]")
    search_from = 0
    while True:
        m = pat.search(out, search_from)
        if m is None:
            return out
        if in_string(out, m.start()):
            search_from = m.end()
            continue
        idx = m.group(1)
        end = m.start()
        i = end - 1
        while i >= 0 and out[i].isspace():
            i -= 1
        if i >= 0 and out[i] == ")":
            depth = 0
            while i >= 0:
                if out[i] == ")":
                    depth += 1
                elif out[i] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                i -= 1
            # include the function name before '('
            j = i - 1
            while j >= 0 and (out[j].isalnum() or out[j] in "_."):
                j -= 1
            start = j + 1
        else:
            j = i
            while j >= 0 and (out[j].isalnum() or out[j] in "_.`"):
                j -= 1
            start = j + 1
        expr = out[start:end].rstrip()
        out = out[:start] + f"element_at({expr}, {idx})" + out[m.end():]


# Aggregate-function renames (CREATE FUNCTION is scalar-only, so
# these go through textual rewrite): the read-side ClickHouse
# aggregates a reference user types against the maintained tables.
_AGG_RENAMES = [
    (r"\buniqExact\(", "count(DISTINCT "),
    (r"\buniq\(", "approx_count_distinct("),
    (r"\bcountIf\(", "count_if("),
    # NOT mapped: sumIf (Spark has no sum_if and the CASE rewrite
    # needs argument reordering, outside this textual subset — write
    # sum(if(cond, x, 0)) instead, which works verbatim in both).
    (r"\btoDate\(", "to_date("),
    (r"\btoHour\(", "hour("),
    # argMax/argMin: positional twins exist in both engines
    (r"\bargMax\(", "max_by("),
    (r"\bargMin\(", "min_by("),
]

# Parametric / multi-arg aggregate rewrites (need capture groups, not
# a prefix rename). Same string-literal-aware subset: plain column
# arguments, no nested calls.
_AGG_REWRITES = [
    # uniqUpTo(N)(x): exact distinct count saturating at N+1
    (
        r"\buniqUpTo\((\d+)\)\(\s*([^()]*?)\s*\)",
        r"least(count(DISTINCT \2), \1 + 1)",
    ),
    # boundingRatio(x, y): slope between the extreme-x points —
    # (y at max x − y at min x) / (max x − min x); try_divide keeps
    # the single-point group NULL instead of an ANSI abort
    (
        r"\bboundingRatio\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)",
        r"try_divide(max_by(\2, \1) - min_by(\2, \1), max(\1) - min(\1))",
    ),
]


def transpile(sql: str, database: str = "AdGuardHome") -> str:
    """ClickHouse SELECT body → Spark SQL (reference-dialect subset).

    Every textual rewrite here is string-literal-aware (via
    :func:`_sub_outside_strings`): ``'uniq(x)'`` inside a quoted
    constant survives untouched. Dialect-subset caveat: ``length()``
    maps to array ``size()`` — in this subset ``length`` is applied to
    arrays (the reference's MVs use it only on splitByChar output);
    ``length()`` on a String column is OUTSIDE the supported subset
    (write ``char_length()``, valid in both dialects, instead)."""
    out = _sub_outside_strings(re.escape(f"{database}."), "", sql)
    out = _rewrite_indexing(out)
    # array length → size (see docstring for the dialect-subset scope)
    out = _sub_outside_strings(r"\blength\(", "size(", out)
    for pat, repl in _AGG_RENAMES:
        out = _sub_outside_strings(pat, repl, out)
    for pat, repl in _AGG_REWRITES:
        out = _sub_outside_strings(pat, repl, out)
    return out


# Column lists nest parens (LowCardinality(String)) — allow one level.
_BALANCED = r"\((?:[^()]|\([^()]*\))*\)"
_MV_RE = re.compile(
    r"CREATE\s+MATERIALIZED\s+VIEW\s+(?:\w+\.)?(?P<mv>\w+)\s+TO\s+"
    rf"(?:\w+\.)?(?P<target>\w+)\s*(?:{_BALANCED})?\s*AS\s*(?P<select>SELECT.*?)(?=;|\Z)",
    re.IGNORECASE | re.DOTALL,
)
_TABLE_RE = re.compile(
    r"create\s+table\s+(?:\w+\.)?(?P<name>\w+)\s*"
    rf"(?P<cols>{_BALANCED})\s*"
    r"engine\s*=\s*SummingMergeTree\s+ORDER\s+BY\s*(?P<keys>\([^)]*\)|\S+)",
    re.IGNORECASE | re.DOTALL,
)


def parse_mv_ddl(ddl_text: str) -> dict[str, dict]:
    """Extract {mv_name: {target, select, keys, measures}} from verbatim
    reference DDL. Keys come from the SummingMergeTree target's ORDER
    BY; measures are the target's remaining (numeric) columns — the
    fold SummingMergeTree applies server-side."""
    tables = {}
    for m in _TABLE_RE.finditer(ddl_text):
        cols_body = m.group("cols").strip()[1:-1]  # strip outer parens
        # split on commas OUTSIDE nested parens (LowCardinality(String))
        parts, depth, cur = [], 0, []
        for ch in cols_body:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            parts.append("".join(cur))
        cols = [c.strip().split()[0].strip("`") for c in parts if c.strip()]
        keys = [
            k.strip().strip("`;")
            for k in m.group("keys").strip("();").split(",")
            if k.strip().strip(";")
        ]
        tables[m.group("name")] = {
            "keys": keys,
            "measures": [c for c in cols if c not in keys],
        }
    out = {}
    for m in _MV_RE.finditer(ddl_text):
        target = m.group("target")
        t = tables.get(target, {"keys": [], "measures": []})
        out[m.group("mv")] = {
            "target": target,
            "select": m.group("select").strip(),
            "keys": t["keys"],
            "measures": t["measures"],
        }
    return out


def mv_aggregate(
    spark: SparkSession, log2: DataFrame, mv: dict, database: str = "AdGuardHome"
) -> DataFrame:
    """Run one parsed MV as the equivalent batch aggregate: the
    transpiled SELECT body emits the per-row delta stream the MV would
    feed its SummingMergeTree target; the GROUP BY + sum() applies the
    fold the target's engine performs at merge time. ClickHouse's
    ``ORDER BY`` inside an MV body is inert for the summed result
    (README semantics; SURVEY §2.7 R2) and is dropped.

    Thread-safe by construction: the source frame binds through
    Spark's templated ``spark.sql(..., log2=df)`` — no shared temp
    views, so the streaming pipeline can fan these out concurrently
    inside foreachBatch."""
    register_clickhouse_functions(spark)
    body = transpile(mv["select"], database)
    body = re.sub(r"ORDER\s+BY(?:(?!FROM).)*$", "", body, flags=re.IGNORECASE | re.DOTALL)
    body = re.sub(r"\bFROM\s+log2\b", "FROM {log2}", body, flags=re.IGNORECASE)
    delta = spark.sql(body, log2=log2)
    if not mv["keys"]:
        return delta
    return delta.groupBy(*mv["keys"]).agg(
        *[F.sum(m).alias(m) for m in mv["measures"]]
    )


def aggregates_from_clickhouse_ddl(ddl_text: str, database: str = "AdGuardHome"):
    """Verbatim reference DDL → the pipeline's custom-aggregate spec:
    ``{target_table: (fn, keys, measures)}`` where ``fn(log2_df)``
    computes the batch delta. Drop this straight into
    ``QuerylogPipeline(custom_aggregates=...)`` and the engine
    maintains YOUR ClickHouse MVs as streaming summing sinks — the
    bring-your-own-MV-DDL path."""
    out = {}
    for mv in parse_mv_ddl(ddl_text).values():
        def fn(log2, _mv=mv):
            return mv_aggregate(log2.sparkSession, log2, _mv, database)

        out[mv["target"]] = (fn, mv["keys"], mv["measures"])
    return out
