"""Streaming topology: one query-log source fanned out to the fact
table + eight additive aggregates (the reference's INSERT→MV cascade)."""
