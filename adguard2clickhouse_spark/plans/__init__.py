from adguard2clickhouse_spark.plans.bucketing import (  # noqa: F401
    bucketed_join_ready,
    write_bucketed,
)
