"""Streaming CEP: ``followedBy``/``within``/``notFollowedBy`` as a
keyed stateful operator (the streaming form of ``operators/cep.py``,
matching Flink's CEP-on-DataStream deployment shape).

Pattern semantics (identical to the batch operator, defined on ms event
time): for each ``first`` event A, the EARLIEST ``second`` event B after
it matches iff B arrives within ``within_ms`` and no ``not_between``
event C occurs at any ms ≤ B's ms after A. Ties at the same millisecond
count as simultaneous, so a C sharing B's ms blocks the match.

Resolution protocol (why emission can lag by one ms-group): once A's
first B is seen, a same-ms C may still arrive, so the match is emitted
only when event time advances past B's ms. A C seen before any B kills
the pending A immediately; a first B outside the window kills it too
(relaxed contiguity binds A to its FIRST following B, same as batch).

State per key is the list of unresolved A events — O(pending patterns),
not O(stream); every A leaves state on its first B/C or on window
expiry. Feed a trailing flush row (any type, far-future ts) to finalize
matches at end of input, as the golden replays do for watermarks.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd

from flink_helloworld_spark.streaming._util import concat_chunks
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType


def followed_by_within_stream(
    df: DataFrame,
    key: str,
    id_col: str,
    tsm_col: str,
    type_col: str,
    first: str,
    second: str,
    within_ms: int,
    not_between: str | None = None,
) -> DataFrame:
    """Per-key streaming pattern matcher. Input columns: ``key``,
    ``id_col`` (unique, orders same-ms events), ``tsm_col`` (event time
    ms), ``type_col``. Emits (key, a_id, b_id, a_ts_ms, b_ts_ms, lag_ms)
    per match, in arrival order."""
    key_type = df.schema[key].dataType
    out_schema = StructType(
        [
            StructField(key, key_type),
            StructField("a_id", LongType()),
            StructField("b_id", LongType()),
            StructField("a_ts_ms", LongType()),
            StructField("b_ts_ms", LongType()),
            StructField("lag_ms", LongType()),
        ]
    )
    # pending A entries as JSON: [{a, at, b, bt}] — b/bt set once the
    # first B has been seen and the entry awaits ms-close confirmation
    state_schema = StructType([StructField("buf", StringType())])

    def fn(
        k: Any, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pending: list[dict] = (
            json.loads(state.get[0]) if state.exists else []
        )
        out: list[dict] = []

        def finalize_closed(now_tsm: int) -> None:
            # emit B-bound entries whose ms group has closed un-blocked,
            # and expire unbound As whose window has passed (no future
            # event at tsm >= now can match them) — this is what keeps
            # state O(pending patterns) instead of O(stream)
            still = []
            for e in pending:
                if e.get("bt") is None and now_tsm - e["at"] > within_ms:
                    continue
                if e.get("bt") is not None and now_tsm > e["bt"]:
                    out.append(
                        {
                            key: k[0],
                            "a_id": e["a"],
                            "b_id": e["b"],
                            "a_ts_ms": e["at"],
                            "b_ts_ms": e["bt"],
                            "lag_ms": e["bt"] - e["at"],
                        }
                    )
                else:
                    still.append(e)
            pending[:] = still

        batch = concat_chunks(batches)
        if batch is not None:
            for rec in batch.sort_values([tsm_col, id_col]).to_dict("records"):
                tsm, etype = int(rec[tsm_col]), rec[type_col]
                finalize_closed(tsm)
                if not_between is not None and etype == not_between:
                    # kills unresolved As AND same-ms B-bound entries —
                    # after finalize_closed(tsm), every surviving bound
                    # entry has bt == tsm (events arrive in ts order and
                    # earlier-bt entries were just emitted), so the kill
                    # is a full clear
                    pending.clear()
                elif etype == second:
                    nxt = []
                    for e in pending:
                        if e.get("bt") is None:
                            if tsm - e["at"] <= within_ms:
                                e["b"], e["bt"] = int(rec[id_col]), tsm
                                nxt.append(e)
                            # first B out of window: A can never match
                        else:
                            nxt.append(e)
                    pending[:] = nxt
                if etype == first:
                    pending.append({"a": int(rec[id_col]), "at": tsm})
        if pending:
            state.update((json.dumps(pending),))
        elif state.exists:
            # drop the key's state slot entirely once nothing is pending:
            # state stays O(keys with open patterns), not O(keys ever
            # seen) — the bounded-state discipline the docstring promises
            state.remove()
        yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return (
        df.select(key, id_col, tsm_col, type_col)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
