from incubator_paimon_trino_spark.streaming.changelog import (
    read_changelog_stream,
    run_to_completion,
    running_totals_stateful,
    sessionized_counts,
    windowed_counts,
)

__all__ = [
    "read_changelog_stream",
    "run_to_completion",
    "running_totals_stateful",
    "sessionized_counts",
    "windowed_counts",
]
