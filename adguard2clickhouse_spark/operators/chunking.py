"""Document chunking: overlapping token windows for context-length prep.

The step between curation and tokenization: long documents become
overlapping windows of ``chunk_tokens`` tokens advancing by ``stride``
(overlap = chunk_tokens − stride preserves cross-boundary context),
with the tail always covered by a final window ending at the last
token. Pure built-ins — one `split`, a per-row start-position array,
one explode, `slice`+`concat_ws` — so the whole operator is a single
narrow projection: no shuffle at all until whatever consumes the
chunks. At 100 TB this matters: chunking multiplies row counts ~n/stride
and must never be the stage that exchanges data.

Deterministic and engine-portable (the x11_chunking oracle replays the
start arithmetic and slicing in DuckDB verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """(id, chunk_start, n_chunk_tokens, chunk_text) — 1-based token
    offsets. Windows start at 1, 1+stride, …; a misaligned tail gets
    one extra window ending exactly at the last token, so every token
    belongs to ≥1 chunk and no chunk (except a short document's single
    one) is shorter than ``chunk_tokens``."""
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be ≥ 1")
    toks = F.col("_toks")
    n = F.size(toks)
    last_start = F.greatest(n - F.lit(chunk_tokens) + 1, F.lit(1))
    starts = F.array_distinct(
        F.concat(
            F.sequence(F.lit(1), last_start, F.lit(stride)),
            F.array(last_start),
        )
    )
    return (
        df.select(
            F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("_toks")
        )
        .select("_id", "_toks", F.explode(starts).alias("chunk_start"))
        .select(
            F.col("_id").alias(id_col),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.least(
                F.lit(chunk_tokens), F.size(toks) - F.col("chunk_start") + 1
            )
            .cast("long")
            .alias("n_chunk_tokens"),
            F.concat_ws(
                " ", F.slice(toks, F.col("chunk_start"), F.lit(chunk_tokens))
            ).alias("chunk_text"),
        )
    )
