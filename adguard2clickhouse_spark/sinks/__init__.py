"""Sinks: the additive summing sink (SummingMergeTree semantics over
Parquet) and the optional ClickHouse writer."""
