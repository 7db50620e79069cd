"""Golden replays of the reference's remaining scripted watermark
fixtures (FIXTURES.md §4), values verbatim from the reference comments.

- 17-tuple allowedLateness script: EventTimeTest.java:246-282
  (tumbling 3 s, allowedLateness 2 s — grace re-fires, expired drops)
- 20-tuple late-side-output script: EventTimeTest.java:334-377
  (tumbling 5 s, allowedLateness 2 s, dropped rows → side channel)
"""

from __future__ import annotations

import tempfile

import pytest

from flink_helloworld_spark.streaming import event_windows as EW
from flink_helloworld_spark.streaming.replay import (
    Step,
    read_script_stream,
    run_available_now,
    write_script,
)

# EventTimeTest.java:246-282 — (value, event_ts, watermark)
ALLOWED_LATE_SCRIPT = [
    Step("a", 35, 1000),
    Step("a", 11, 100),
    Step("a", 13, 2800, 6100),
    Step("a", 2, 1500),    # 2999+2000 <= 6100 → drop
    Step("a", 19, 2500),   # drop
    Step("a", 22, 3100),   # 5999+2000 > 6100 → grace re-fire
    Step("a", 18, 4700),
    Step("a", 17, 5900),
    Step("a", 29, 6000),
    Step("a", 16, 8000),
    Step("a", 77, 9100),
    Step("a", 65, 9500),
    Step("a", 14, 11000, 13000),
    Step("a", 89, 100),    # drop
    Step("a", 72, 5500),   # drop
    Step("a", 32, 7900),   # drop
    Step("a", 10, 11500),  # 11999+2000 >= 13000 → grace re-fire
]

# final per-window sums from the reference's per-row annotations
ALLOWED_LATE_EXPECTED = {0: 59, 3000: 57, 6000: 45, 9000: 166}

# EventTimeTest.java:334-377 — window 5 s, lateness 2 s
LATE_SIDE_SCRIPT = [
    Step("a", 1, 1100),
    Step("a", 2, 300),
    Step("a", 3, 5100),
    Step("a", 4, 4600),
    Step("a", 5, 2900),
    Step("a", 6, 13000),
    Step("a", 7, 9100, 11000),
    Step("a", 8, 3000),    # 4999+2000 <= 11000 → late
    Step("a", 9, 6700),
    Step("a", 10, 9900, 18000),
    Step("a", 11, 13000),  # late
    Step("a", 12, 8888),   # late
    Step("a", 13, 12000),  # late
    Step("a", 14, 15300),
    Step("a", 15, 17200),
    Step("a", 16, 1300),   # late
    Step("a", 17, 21000),
    Step("a", 18, 23000),
    Step("a", 19, 5000, 26000),  # itself late (9999+2000 <= 18000)
    Step("a", 20, 19000),  # late
]

LATE_SIDE_EXPECTED_WINDOWS = {0: 12, 5000: 29, 10000: 6, 15000: 29, 20000: 35}
LATE_SIDE_EXPECTED_LATE_VALUES = {8, 11, 12, 13, 16, 19, 20}


def _replay(spark, steps, name, build, output_mode="append", wm_offset=1):
    workdir = tempfile.mkdtemp(prefix=f"{name}-")
    write_script(steps, workdir, wm_offset=wm_offset)
    return run_available_now(build(read_script_stream(spark, workdir)), name, output_mode)


def test_allowed_lateness_reference_script(spark):
    rows = _replay(
        spark, ALLOWED_LATE_SCRIPT, "golden_lateness",
        lambda s: EW.tumbling_sum_stream(s, "3 seconds", delay="2 seconds"),
        output_mode="update",
    )
    # update mode re-emits as the window grows; the memory sink does not
    # preserve batch order, but sums of positive values are monotone, so
    # the final state is the max emission per window
    final = {}
    for r in rows:
        k = int(r.window_start.timestamp() * 1000)
        final[k] = max(final.get(k, 0), r.window_sum)
    assert final == ALLOWED_LATE_EXPECTED


@pytest.mark.slow
def test_late_side_output_reference_script(spark):
    # This script's data outpaces the scripted watermark by up to 2 s
    # (t6 at ts 13000 while the Flink watermark is still unset) — Flink
    # bounded out-of-orderness. Standard Spark mapping: delay =
    # out-of-orderness + lateness = 4 s, driver rows offset by
    # delay - lateness + 1 = 2001 so the Spark watermark lands exactly
    # on the Flink drop boundary.
    rows = _replay(
        spark, LATE_SIDE_SCRIPT, "golden_side_main",
        lambda s: EW.tumbling_sum_stream(s, "5 seconds", delay="4 seconds"),
        output_mode="update",
        wm_offset=2001,
    )
    final = {}
    for r in rows:  # max emission = final state (monotone sums)
        k = int(r.window_start.timestamp() * 1000)
        final[k] = max(final.get(k, 0), r.window_sum)
    assert final == LATE_SIDE_EXPECTED_WINDOWS
    # side channel: the per-row late classifier
    side = _replay(
        spark, LATE_SIDE_SCRIPT, "golden_side_late",
        lambda s: EW.late_rows_stream(s, window_ms=5000, lateness_ms=2000),
    )
    assert {r.v for r in side if r.is_late} == LATE_SIDE_EXPECTED_LATE_VALUES
    assert len(side) == len(LATE_SIDE_SCRIPT)


# WindowTest.java:222-242 — session gap 2 s, keys {a,b}, merge scenarios
SESSION_SCRIPT = [
    Step("a", 21, 1000),          # window [1000,3000)
    Step("a", 32, 1500),          # merges → [1000,3500)
    Step("a", 13, 3600, 5500),    # new session [3600,5600); wm fires prior
    Step("b", 3, 5600),           # b: [5600,7600)
    Step("b", 9, 6000),           # merges → [5600,8000)
    Step("b", 22, 7500),          # merges → [5600,9500)
    Step("b", 50, 10000),         # new b session [10000,12000)
    Step("b", 12, 11000, 9500),   # merges → [10000,13000); wm fires prior
    Step("b", 5, 15000, 13500),   # new session; wm fires [10000,13000)
]

SESSION_EXPECTED = {
    ("a", 1000): 53,
    ("a", 3600): 13,
    ("b", 5600): 34,
    ("b", 10000): 62,
    ("b", 15000): 5,
}


def test_session_merge_reference_script(spark):
    rows = _replay(
        spark, SESSION_SCRIPT, "golden_session",
        lambda s: EW.session_sum_stream(s, "2 seconds"),
    )
    got = {(r.k, int(r.window_start.timestamp() * 1000)): r.window_sum for r in rows}
    assert got == SESSION_EXPECTED


def test_basic_event_time_reference_script(spark):
    # EventTimeTest.java:60-83 — the 4-row basic script, tumbling 2 s:
    # [0,2000) fires 20+30 at wm 2100; 1900 arrives late (dropped);
    # [2000,4000)=22 flushes at end of input.
    script = [
        Step("a", 20, 500),
        Step("a", 30, 1800, 2100),
        Step("a", 11, 1900),  # late
        Step("a", 22, 3000),
    ]
    rows = _replay(
        spark, script, "golden_basic",
        lambda s: EW.tumbling_sum_stream(s, "2 seconds"),
    )
    got = {int(r.window_start.timestamp() * 1000): r.window_sum for r in rows}
    assert got == {0: 50, 2000: 22}
