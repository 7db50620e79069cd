"""transformWithStateInPandas upgrade path (SURVEY §7 stage 4).

Spark 4's ``transformWithStateInPandas`` supersedes
``applyInPandasWithState`` with typed state handles (ValueState /
ListState / MapState — the same vocabulary as the reference's Flink
state, StateTest.java), native TTL per state, and timers. The engine's
custom operators live on ``applyInPandasWithState`` (stable since 3.4);
this module carries the forward port of the core pattern so migration
is a swap, not a rewrite.

Runtime requirement: the transformWithState Python worker speaks
protobuf to the JVM (``google.protobuf`` import at query start) — absent
in minimal installs; ``pip install protobuf`` (or pyspark[connect])
enables it. tests/test_scale_ops.py skips gracefully where missing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

ROLLING_OUTPUT = StructType(
    [
        StructField("k", StringType()),
        StructField("seq", LongType()),
        StructField("v", DoubleType()),
        StructField("running_total", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("total", DoubleType())])


class RollingSumProcessor(StatefulProcessor):
    """Per-event rolling sum on typed ValueState — the
    ``rolling_sum_stream`` semantics (reference KeyedStream.sum,
    HelloWorldFlinkTest.java:45) on the new API. A TTL would be
    ``state_ttl_duration_ms`` on ``getValueState`` (reference state TTL,
    StateTest.java:904-932)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._total = handle.getValueState("total", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (total,) = self._total.get() if self._total.exists() else (0.0,)
        out = []
        for pdf in rows:
            for rec in pdf.sort_values("seq").to_dict("records"):
                total = round(total + rec["v"], 9)
                out.append(
                    {"k": key[0], "seq": rec["seq"], "v": rec["v"], "running_total": total}
                )
        self._total.update((total,))
        yield pd.DataFrame(out, columns=[f.name for f in ROLLING_OUTPUT.fields])

    def close(self) -> None:
        pass


def rolling_sum_tws(stream: DataFrame, key: str = "k") -> DataFrame:
    """Rolling per-event sum via transformWithStateInPandas."""
    return (
        stream.selectExpr(f"{key} AS k", "seq", "CAST(v AS DOUBLE) AS v")
        .groupBy("k")
        .transformWithStateInPandas(
            RollingSumProcessor(),
            outputStructType=ROLLING_OUTPUT,
            outputMode="append",
            timeMode="none",
        )
    )
