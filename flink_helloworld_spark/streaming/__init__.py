"""Custom stateful streaming operators (SURVEY.md §4 "needs custom work").

Everything here runs on ``applyInPandasWithState``: Arrow-batched, keyed,
partition-parallel, state spillable via the RocksDB state store — the
idiomatic Spark substitute for Flink's keyed-state operator API.
"""

from flink_helloworld_spark.streaming._util import (  # noqa: F401
    apply_stateful_partitions,
    suggest_stateful_partitions,
)
