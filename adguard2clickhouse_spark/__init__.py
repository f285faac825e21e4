"""adguard2clickhouse_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``centralhardware/adguard2clickhouse``.

The reference (read-only at /root/reference) is a single-threaded Python
collector (src/collector.py) that tails AdGuard Home's JSON query log,
parses each line (including the base64 DNS answer packet), and inserts
rows into ClickHouse, where seven materialized views maintain additive
aggregates (README.md:24-189).

This package re-expresses both halves Spark-first:

- ``sources``    — batch + Structured Streaming readers for the query log
- ``operators``  — the parse/transform pipeline, the DNS wire-format
                   parser (Arrow-batched), the eight aggregates, and the
                   large-scale extension operators (dedup, similarity
                   search, text analysis, multimodal plumbing)
- ``functions``  — ClickHouse-semantics scalar functions on Spark builtins
- ``sinks``      — additive "summing" sink (SummingMergeTree semantics)
                   over Parquet, plus an optional ClickHouse writer
- ``streaming``  — the one-source → fact + 8-aggregate fanout topology

Everything is declarative DataFrame API so Catalyst handles pushdown,
pruning, partial aggregation and AQE; Python executes only inside the
one genuinely non-relational op (DNS packet decode) and the clearly
stubbed multimodal decoders, always Arrow-batched.
"""

__version__ = "0.1.0"
