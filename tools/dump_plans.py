#!/usr/bin/env python3
"""Dump .explain('formatted') for headline queries to plans/r10/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [query ...]
  tag    "before" / "after" (file suffix)
  query  subset of bench.HEADLINE (default: all)

Plans are taken at sf0.001 (scale-independent; AQE re-partitions at
runtime — same convention as PLANS.md).  Streaming queries return the
drained result frame; their plan shows the batch surface of the drain,
which is what the noop sink times.
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from dp3_spark import queries as Q  # noqa: E402
from dp3_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def explain_str(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        qe, "formatted"
    )


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dp3_plan_dump")
    qs = Q.queries()
    for name in names:
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            df = qs[name](spark, SF_DIR)
            txt = explain_str(df)
        except Exception:
            txt = "PLAN DUMP FAILED:\n" + traceback.format_exc()
        with open(path, "w") as f:
            f.write(f"# {name} ({tag}) — explain('formatted') at {SF_DIR}\n")
            f.write(txt)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
