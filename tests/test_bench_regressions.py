"""Canary-normalized regression flagging (VERDICT r6 item 2): the
bench harness must separate "this query regressed" from "the single-JVM
session aged" — round 6's raw-median comparison produced 17 false
positives, every one proven to be session aging on solo re-measure.

These tests drive the pure flagging function with synthetic records:
a genuine 2x plan regression must be caught even when the canary is
flat, and a query inflated ONLY by measured session aging must NOT be
flagged once its canary tick explains the inflation. No Spark needed.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _prev(queries: dict, canary: list) -> dict:
    return {
        "detail": {k: {"median": v} for k, v in queries.items()},
        "aging_canary": canary,
    }


FLAT = [[0, 1.5], [30, 0.22], [60, 0.23], [90, 0.22], [120, 0.24]]


def test_canary_factor_steady_session_is_identity(bench):
    for pos in (0, 15, 45, 100, 130):
        assert bench._canary_factor(pos, FLAT) == pytest.approx(1.0)


def test_canary_factor_excludes_warmup_tick(bench):
    # position-0 tick is 7x steady (first-query codegen); queries at
    # early positions must NOT be deflated by it
    assert bench._canary_factor(3, FLAT) == pytest.approx(1.0)


def test_canary_factor_reads_local_aging(bench):
    aged = [[0, 1.5], [30, 0.2], [60, 0.2], [90, 0.6], [120, 0.6]]
    # steady = median(0.2, 0.2, 0.6, 0.6) = 0.4; late tick 0.6 => 1.5x
    assert bench._canary_factor(95, aged) == pytest.approx(1.5)
    # never deflates below 1.0 (early fast ticks can't MASK regressions)
    assert bench._canary_factor(35, aged) == pytest.approx(1.0)


def test_deliberate_regression_caught_despite_flat_canary(bench):
    prev = _prev({"q_slow": 2.0, "q_ok": 1.0}, FLAT)
    timings = {"q_slow": 4.1, "q_ok": 1.05}
    positions = {"q_slow": 10, "q_ok": 40}
    out = bench._flag_regressions(timings, positions, FLAT, prev)
    assert set(out) == {"q_slow"}
    assert out["q_slow"][0] == 2.0 and out["q_slow"][1] == 4.1
    assert out["q_slow"][2] == pytest.approx(2.05, abs=0.01)


def test_aging_inflation_not_flagged(bench):
    # the round-6 false-positive shape: a late-position query inflated
    # 2x, with the canary at its position inflated the same 2x — the
    # normalized ratio is ~1.0 and must not be flagged
    aged = [[0, 1.5], [30, 0.2], [60, 0.2], [90, 0.2], [150, 0.44]]
    prev = _prev({"q_late": 2.0}, FLAT)
    out = bench._flag_regressions({"q_late": 4.0}, {"q_late": 155}, aged, prev)
    assert out == {}
    # same raw inflation WITHOUT canary cover => flagged
    out2 = bench._flag_regressions({"q_late": 4.0}, {"q_late": 155}, FLAT, prev)
    assert set(out2) == {"q_late"}


def test_prev_side_aging_also_normalized(bench):
    # the previous record measured 4.0s under 2x aging; today's clean
    # 2.2s is NOT a regression (normalized prev = 2.0)
    prev_aged = [[0, 1.5], [30, 0.2], [60, 0.2], [150, 0.4]]
    prev = _prev({"q": 4.0}, prev_aged)
    prev["detail"]["q"]["median"] = 4.0
    # place q late in the prev run order by padding earlier entries
    det = {f"pad{i}": {"median": 0.1} for i in range(150)}
    det["q"] = {"median": 4.0}
    prev["detail"] = det
    out = bench._flag_regressions({"q": 2.2}, {"q": 5}, FLAT, prev)
    assert out == {}


def test_failed_prev_entry_skipped(bench):
    prev = _prev({"q": 1.0}, FLAT)
    prev["detail"]["q"] = {"err": "boom", "sec": 0.5}
    assert bench._flag_regressions({"q": 5.0}, {"q": 0}, FLAT, prev) == {}


def test_elevated_prev_tick_cannot_manufacture_regressions(bench):
    # the REAL r7 failure shape: the previous record's position-30 tick
    # carries residual warmup (0.47 vs 0.22 steady), so symmetric
    # normalization deflated prev 2x and flagged ~40 queries that had
    # gotten FASTER. Normalization must only CLEAR raw flags.
    prev_canary = [[0, 1.56], [30, 0.47], [60, 0.248], [90, 0.221],
                   [120, 0.238], [150, 0.216], [180, 0.237]]
    cur_canary = [[0, 1.787], [30, 0.344], [60, 0.311], [90, 0.278],
                  [120, 0.275], [150, 0.259], [180, 0.258]]
    prev = _prev({"wordcount": 0.459, "pricing_summary": 1.63}, prev_canary)
    out = bench._flag_regressions(
        {"wordcount": 0.424, "pricing_summary": 1.628},
        {"wordcount": 0, "pricing_summary": 1},
        cur_canary,
        prev,
    )
    assert out == {}
    # and a genuine 2x regression at the same early position IS caught
    out2 = bench._flag_regressions(
        {"wordcount": 0.95}, {"wordcount": 0}, cur_canary, prev
    )
    assert set(out2) == {"wordcount"}


def test_machine_drift_clears_global_inflation_but_not_real_regressions(bench):
    # whole-box drift: this round's canary steady level is 1.2x last
    # round's (shared machine got slower) — a query inflated ~1.35x is
    # machine drift, a query inflated 2x is real
    prev_canary = [[0, 1.5], [30, 0.20], [60, 0.20], [90, 0.20], [120, 0.20]]
    cur_canary = [[0, 1.8], [30, 0.24], [60, 0.24], [90, 0.24], [120, 0.24]]
    prev = _prev({"drifted": 2.0, "regressed": 2.0}, prev_canary)
    out = bench._flag_regressions(
        {"drifted": 2.7, "regressed": 4.0},
        {"drifted": 10, "regressed": 40},
        cur_canary,
        prev,
    )
    assert set(out) == {"regressed"}
    # a FASTER machine must never hide a real regression (clamp at 1.0)
    out2 = bench._flag_regressions(
        {"regressed": 4.0}, {"regressed": 40}, prev_canary,
        _prev({"regressed": 2.0}, cur_canary),
    )
    assert set(out2) == {"regressed"}
    # drift below the 1.07 dead-band is between-session noise and must
    # not soften the bar: 5% steady drift + a 1.35x mover stays flagged
    noise_canary = [[0, 1.8], [30, 0.21], [60, 0.21], [90, 0.21], [120, 0.21]]
    out3 = bench._flag_regressions(
        {"q": 2.7}, {"q": 40}, noise_canary,
        _prev({"q": 2.0}, prev_canary),
    )
    assert set(out3) == {"q"}


def test_suggest_stateful_partitions_sqrt_law():
    """The auto-sizer must reproduce BOTH round-6 hand-found optima —
    ~8 partitions at 1,250 input rows/trigger and ~32 at 12,500 — which
    a linear rows/N rule cannot (it gives the same answer for both up
    to rounding). n* = sqrt(rows x c_row/c_fixed)."""
    from flink_helloworld_spark.streaming import suggest_stateful_partitions

    assert suggest_stateful_partitions(1250) == 8
    n10 = suggest_stateful_partitions(12500)
    assert 20 <= n10 <= 32
    # floor and cap behavior
    assert suggest_stateful_partitions(0) == 2
    assert suggest_stateful_partitions(10) == 2
    assert suggest_stateful_partitions(12500, cap=16) == 16
    # monotone in rows
    assert suggest_stateful_partitions(125000) > n10


def test_prev_record_pinned_to_last_driver_stamped_round(bench, tmp_path):
    """VERDICT r7 item 2: mid-round, the newest bench_local_r*.json is
    THIS round's own earlier run — using it as the regression baseline
    makes `regressions_vs_prev` a same-code environment comparison.
    `_load_prev_record` must return the record of the last DRIVER-STAMPED
    round (newest BENCH_r{N}.json = round N-1 official), skipping any
    in-round bench_local files from the current round."""
    import json

    def w(name, payload):
        (tmp_path / name).write_text(json.dumps(payload))

    # driver-stamped rounds 6 and 7 -> current round is 8
    w("BENCH_r06.json", {"value": 1})
    w("BENCH_r07.json", {"value": 1})
    w("bench_local_r06.json", {"round": 6})
    w("bench_local_r07.json", {"round": 7})
    assert bench._next_round(str(tmp_path)) == 8
    # no in-round record yet: baseline is r7 (the last stamped round)
    assert bench._load_prev_record(str(tmp_path))["round"] == 7
    # an earlier in-round r8 run appears: baseline must STAY r7
    w("bench_local_r08.json", {"round": 8})
    assert bench._load_prev_record(str(tmp_path))["round"] == 7
    # no stamped rounds at all -> current=0 -> no baseline
    empty = tmp_path / "empty"
    empty.mkdir()
    assert bench._load_prev_record(str(empty)) == {}


def test_noise_floor_and_missing_prev(bench):
    prev = _prev({"tiny": 0.15}, FLAT)
    # sub-200ms baseline is noise, never flagged
    assert bench._flag_regressions({"tiny": 0.5}, {"tiny": 0}, FLAT, prev) == {}
    assert bench._flag_regressions({"new_q": 9.9}, {"new_q": 0}, FLAT, prev) == {}
    assert bench._flag_regressions({"q": 9.9}, {"q": 0}, FLAT, {}) == {}


def test_codegen_canary_series_can_clear_what_wordcount_misses():
    """The second (codegen-heavy) canary series participates in both
    the within-run factor and the cross-round machine drift via MAX:
    a flag raw-ratio 1.5 on a session whose codegen canary steady
    level doubled (wordcount flat) is cleared; records without the
    codegen series behave exactly as before (factor 1.0)."""
    import bench

    prev = {
        "detail": {"q": {"median": 1.0}},
        "aging_canary": [[0, 0.25], [30, 0.25], [60, 0.25]],
        "aging_canary_codegen": [[0, 1.0], [30, 1.0], [60, 1.0]],
    }
    timings = {"q": 1.5}
    positions = {"q": 30}
    flat = [[0, 0.25], [30, 0.25], [60, 0.25]]
    # wordcount flat, codegen steady doubled -> machine drift 2x
    slow_cg = [[0, 2.0], [30, 2.0], [60, 2.0]]
    out = bench._flag_regressions(
        timings, positions, flat, prev, canary_cg=slow_cg
    )
    assert out == {}  # cleared by the codegen machine factor
    # without the codegen series the same numbers flag
    out2 = bench._flag_regressions(timings, positions, flat, prev)
    assert "q" in out2
    # prev record WITHOUT a codegen series: a flat current codegen
    # series carries no cross-round information (no baseline to drift
    # from), so the flag correctly stands — conservative direction
    prev_old = {
        "detail": {"q": {"median": 1.0}},
        "aging_canary": [[0, 0.25], [30, 0.25], [60, 0.25]],
    }
    out3 = bench._flag_regressions(
        timings, positions, flat, prev_old, canary_cg=slow_cg
    )
    assert "q" in out3
