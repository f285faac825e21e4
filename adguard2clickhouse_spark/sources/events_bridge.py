"""events → log2 bridge (FIXTURES.md §B usage mapping).

The driver's correctness gate runs over the TPC-H-ish tables, so the
reference-parity aggregates (SURVEY.md §2.5) are exercised through a
deterministic mapping of the ``events`` table onto the log2 schema:
``ts``→date_time, ``event_type='error'``→IsFiltered, json ``props.k``
drives hostname shape / CP / Upstream / rcode / Cached, ``user_id``
drives QH and IP.

The mapping is ONE SQL string, written in the common subset of Spark
SQL and DuckDB SQL, so the Spark plan and the DuckDB oracle transform
identically by construction; only the aggregate under test differs.
It deliberately produces IP-literal and single-label hostnames so the
tld_stats F3 predicate (README.md:148) has something to exclude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from adguard2clickhouse_spark.sources.tables import load_table

# Common-dialect notes: TRY_CAST (both), regexp_extract(s,re,group)
# (both, RE2-compatible res), '||' on strings (both), CAST AS STRING
# (both — STRING is a VARCHAR alias in DuckDB), floor (both),
# % on BIGINT (both).
LOG2_FROM_EVENTS_SQL = """
SELECT
  ts AS date_time,
  CASE
    WHEN k < 5  THEN '1.2.3.4'
    WHEN k < 8  THEN '2001:db8::1'
    WHEN k < 12 THEN 'localhost'
    ELSE 'h' || CAST(user_id AS STRING) || '.s' || CAST(k % 10 AS STRING)
             || '.' || event_type
  END AS QH,
  event_type AS QT,
  'IN' AS QC,
  CASE WHEN k % 3 = 0 THEN '' WHEN k % 3 = 1 THEN 'doh' ELSE 'dot' END AS CP,
  'up' || CAST(k % 4 AS STRING) AS Upstream,
  '10.0.' || CAST(user_id % 16 AS STRING) || '.' || CAST(user_id % 251 AS STRING) AS IP,
  event_type = 'error' AS IsFiltered,
  CAST(floor(value * 1000) AS BIGINT) AS Elapsed,
  k % 2 = 0 AS Cached,
  CAST(k % 6 AS INT) AS rcode
FROM (
  SELECT *, TRY_CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS INT) AS k
  FROM events
) _ev
""".strip()


# The bridged frame is a pure function of (session, sf_dir); parsing
# and analyzing the mapping SQL costs ~300 ms of driver time per call
# (measured), so it follows the same session-scoped cache discipline
# as sources.tables.load_table.
_CACHE: dict[tuple[int, str], DataFrame] = {}


def log2_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet and apply the bridge mapping."""
    key = (id(spark._jsparkSession), sf_dir)
    cached = _CACHE.get(key)
    if cached is None:
        load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
        cached = _CACHE[key] = spark.sql(LOG2_FROM_EVENTS_SQL)
    return cached


def oracle_cte(select_sql: str) -> str:
    """Wrap an aggregate SELECT (referencing ``log2``) with the bridge CTE
    for the DuckDB oracle."""
    return f"WITH log2 AS (\n{LOG2_FROM_EVENTS_SQL}\n)\n{select_sql}"
