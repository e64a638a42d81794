"""Driver-artifact contract for bench.py.

BENCH_r05.json recorded `parsed: null` because bench.py printed its whole
result — 46 timings + methodology + three 20-entry scaling dicts — as ONE
final stdout line, and the driver keeps only a bounded stdout tail, which
cut the line's head.  The contract now is: the FINAL stdout line is a
compact, self-contained JSON summary that stays under the tail budget even
with worst-case values, and the full result goes to bench_full.json + a
preceding line.  These tests pin that contract so a future headline
addition cannot silently regrow the line past the budget.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_final_line_fits_driver_tail_worst_case():
    # worst-case: every headline at a 4-digit-seconds timing — the guard
    # must not depend on queries staying fast
    timings = {n: 9999.999 for n in bench.HEADLINE}
    # the load dict must carry every key main() actually emits, at
    # worst-case widths — r9 advice: omitting steal_max understated the
    # real worst-case line vs the 1800 B driver tail budget
    line = bench.final_line(
        timings,
        0.1,
        load={
            "start": 99.99,
            "max": 99.99,
            "end": 99.99,
            "steal_max": 99.99,
            "canary_1t": 9999.999,
            "canary_32t": 9999.999,
        },
    )
    assert len(line) <= bench.FINAL_LINE_MAX_BYTES, (
        f"{len(line)} B final line exceeds the {bench.FINAL_LINE_MAX_BYTES} B "
        "driver tail budget — trim the metric string or move fields to "
        "bench_full.json"
    )


def test_final_line_is_complete_json_with_required_fields():
    timings = {n: 1.234 for n in bench.HEADLINE}
    out = json.loads(bench.final_line(timings, 0.1))
    assert out["unit"] == "sec"
    assert out["sf"] == 0.1
    assert set(out["queries"]) == set(bench.HEADLINE)
    assert out["value"] == round(sum(timings.values()), 2)
    assert out["noise_band_pct"] == 30


def test_final_line_carries_load_stamp_when_given():
    # r8 verdict ask #1: the artifact must carry the host-load context so
    # a degraded-host bench is attributable without forensic A/Bs
    timings = {n: 1.0 for n in bench.HEADLINE}
    out = json.loads(
        bench.final_line(timings, 0.1, load={"start": 0.1, "max": 7.2, "end": 1.0})
    )
    assert out["load1m"] == {"start": 0.1, "max": 7.2, "end": 1.0}


def test_scaling_queries_are_headlines():
    # every scaling family needs its sf0.1 baseline from the headline run
    assert set(bench.SCALING) <= set(bench.HEADLINE)
