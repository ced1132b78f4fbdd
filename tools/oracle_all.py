"""Full-surface oracle gate: like tests/driver_sim.py but over ALL_QUERIES
(including probes the driver only sees through digest composites) — the
check an optimization round runs after touching an operator whose probes
are digest-folded.

    timeout 900 python tools/oracle_all.py [sf_dir] [--only=name1,name2]

Queries without a registered oracle run rows-only (>= 0 rows).
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
    import __spark_entry__  # noqa: F401  (populates the registry)

    from financial_data_ingestion_canonical_snowflake_spark.plans.registry import (
        ALL_ORACLE_SQL,
        ALL_QUERIES,
    )
    from tests.oracle_compare import compare, duckdb_conn

    q = dict(ALL_QUERIES)
    o = ALL_ORACLE_SQL
    con = duckdb_conn(sf_dir)
    if wanted is not None:
        unknown = wanted - set(q)
        if unknown:
            raise SystemExit(f"--only names not registered: {sorted(unknown)}")
        q = {n: f for n, f in q.items() if n in wanted}
    n_fail = 0
    for name, fn in q.items():
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
