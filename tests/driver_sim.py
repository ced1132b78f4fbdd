"""Driver simulation: run the FULL driver-facing surface exactly the way
the correctness driver does — a hostile SparkSession (non-UTC timezone, no
engine confs), sf0.01, every oracle-paired `queries()` entry compared
against its DuckDB twin. Run from repo root:

    timeout 580 python tests/driver_sim.py [sf_dir] [--only=name1,name2]

``--only`` re-runs a subset — e.g. the vector family after an embeddings
fixture change, without paying the full multi-hour sf1 oracle sweep.
"""

from __future__ import annotations

import gc
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    wanted = set(only[0].split(",")) if only else None
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    from tests.oracle_compare import compare, duckdb_conn

    q = e.queries()
    o = e.oracle_sql()
    con = duckdb_conn(sf_dir)
    n_fail = 0
    if wanted is not None:
        unknown = wanted - set(q)
        if unknown:
            # a typo must not record a vacuous 0-entry "pass"
            raise SystemExit(
                f"--only names not in the driver window: {sorted(unknown)}"
            )
        q = {n: f for n, f in q.items() if n in wanted}
    for name, fn in q.items():
        # per-query isolation — clear leftover operator-internal caches and
        # force a Python GC so py4j releases JVM-side plan/broadcast refs
        # (their accumulation measurably degrades late queries; bench.py
        # documents the numbers)
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in o:
                rep = compare(df, con, o[name])
                ok = rep["ok"]
            else:
                rep = {"rows": df.count()}
                ok = rep["rows"] >= 0
        except Exception as exc:  # noqa: BLE001
            ok, rep = False, {"err": repr(exc)[:300]}
        dt = time.time() - t0
        status = "ok " if ok else "FAIL"
        print(f"{status} {name:40s} {dt:6.2f}s {'' if ok else rep}", flush=True)
        n_fail += 0 if ok else 1
    print(f"\n{len(q) - n_fail}/{len(q)} pass")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
