"""Plan-level utilities: explain helpers + the batch iteration loop."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (for assertions on plan shape:
    BroadcastHashJoin present, PushedFilters populated, exchange count)."""
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def observed(df: DataFrame, name: str, *metric_cols: Column):
    """Accumulator-style metrics (reference IntCounter accumulators /
    sink-side running sums, SURVEY §2.4 A12, StateTest.java:934-943):
    attach named aggregate observations evaluated as a side effect of
    the next action — the declarative substitute for per-operator
    counters. Returns (df_with_observation, Observation handle); read
    ``obs.get`` after an action."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metric_cols), obs


def iterate_fixpoint(
    df: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    continue_cond: Column,
    max_iters: int = 100,
) -> DataFrame:
    """Feedback iteration (reference ``iterate()``/``closeWith()``,
    HelloWorldFlinkTest.java:422-433: rows loop through +1 until > 5,
    with two exits).

    Streaming iteration has no Spark equivalent (SURVEY §2.5 J5 —
    documented out of streaming scope); the batch expression is a
    driver-side loop over DataFrames: rows matching ``continue_cond``
    are fed back through ``step``, others exit. ``localCheckpoint``
    truncates the growing lineage each round so the loop scales with
    iterations.
    """
    from pyspark.sql import functions as F

    from flink_helloworld_spark.operators.relational import union_streams

    exited: list[DataFrame] = []
    work = df
    for _ in range(max_iters):
        looping = work.where(continue_cond)
        # NULL-cond rows EXIT (they don't satisfy "continue"): a bare
        # ~cond would exclude them from BOTH branches and silently drop
        # them — the same NULL-routing rule as filter_split
        exited.append(work.where(~F.coalesce(continue_cond, F.lit(False))))
        if looping.isEmpty():
            break
        work = step(looping).localCheckpoint(eager=True)
    else:
        exited.append(work.where(continue_cond))  # max-iters safety exit
    return union_streams(*exited)
