"""Capture ``explain("formatted")`` for bench-surface queries into
plans/<tag>/<query>_<suffix>.txt, plus a one-line red-flag summary per plan
(Exchange count, join strategies, Python-eval nodes, cartesian products).

Usage:
    python tools/capture_plans.py <tag> <suffix> [--only=q1,q2] [--skip-streaming]

The streaming live probes EXECUTE their drain when the query callable runs,
so they are skipped by default (--skip-streaming is implied unless
--include-streaming is passed); their "plan" is the returned state read,
not the drain, and the drain cost is profiled separately
(tools/profile_streaming.py).
"""

from __future__ import annotations

import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAMING = {
    "stream_live_windowed_agg",
    "stream_live_scd2",
    "stream_live_interval_join",
    "ns_stream_live_sinks",
    "ns_stream_rebucket_drain",
}


def summarize(plan: str) -> str:
    counts = {
        "Exchange": len(re.findall(r"\bExchange\b", plan)),
        "BHJ": len(re.findall(r"BroadcastHashJoin", plan)),
        "SMJ": len(re.findall(r"SortMergeJoin", plan)),
        "SHJ": len(re.findall(r"ShuffledHashJoin", plan)),
        "NLJ": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "CART": len(re.findall(r"CartesianProduct", plan)),
        "PyEval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)
        ),
        "Scan": len(re.findall(r"Scan parquet", plan)),
        "Window": len(re.findall(r"\bWindow\b", plan)),
        "Sort": len(re.findall(r"\bSort \[", plan)),
    }
    return " ".join(f"{k}={v}" for k, v in counts.items() if v)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = None
    include_streaming = "--include-streaming" in sys.argv
    for a in sys.argv[3:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))

    import __spark_entry__ as entrymod
    from financial_data_ingestion_canonical_snowflake_spark.session import get_spark

    spark = get_spark(app_name="fincan-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod.queries()
    from financial_data_ingestion_canonical_snowflake_spark.plans.registry import (
        ALL_QUERIES,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(outdir, exist_ok=True)

    names = [
        n
        for n in sorted(ALL_QUERIES)
        if not n.endswith(("_modes", "_digest"))
    ]
    if only is not None:
        names = [n for n in names if n in only]
    elif not include_streaming:
        names = [n for n in names if n not in STREAMING]

    summary_lines = []
    for name in names:
        spark.catalog.clearCache()
        try:
            df = ALL_QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            stdout = sys.stdout
            sys.stdout = buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            plan = buf.getvalue()
        except Exception as exc:  # capture must not die mid-sweep
            plan = f"ERROR: {exc!r}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        line = f"{name}: {summarize(plan)}"
        summary_lines.append(line)
        print(line, flush=True)

    with open(os.path.join(outdir, f"_summary_{suffix}.txt"), "w") as fh:
        fh.write("\n".join(summary_lines) + "\n")


if __name__ == "__main__":
    main()
