"""Sources: query-log readers (batch + streaming) and the driver's
parquet test tables."""
