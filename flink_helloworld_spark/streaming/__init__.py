"""Custom stateful streaming operators (SURVEY.md §4 "needs custom work").

Everything here runs on ``applyInPandasWithState``: Arrow-batched, keyed,
partition-parallel, state spillable via the RocksDB state store — the
idiomatic Spark substitute for Flink's keyed-state operator API.
"""
