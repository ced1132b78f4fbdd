"""Measure per-trigger state-table write I/O: whole-table vs bucket-scoped.

VERDICT r11 next-step #1 asks for a before/after written-bytes number for
the streaming sinks' state folds. This drives the SAME sink class
(ExactDedupSink — additive fold, ledger-guarded in scoped mode; and
IvfIndexSink — keyed fold) over the same document/embedding batches in
both layouts and reports, per trigger, the bytes of parquet files that
were created or changed under the state-table root.

Run from repo root:  python tools/measure_sink_io.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from financial_data_ingestion_canonical_snowflake_spark.operators.merge import (  # noqa: E402
    PART_COL,
)
from financial_data_ingestion_canonical_snowflake_spark.operators.storage import (  # noqa: E402
    ParquetTable,
)
from financial_data_ingestion_canonical_snowflake_spark.session import (  # noqa: E402
    get_spark,
)
from financial_data_ingestion_canonical_snowflake_spark.streaming.dedup_stream import (  # noqa: E402
    ExactDedupSink,
)
from financial_data_ingestion_canonical_snowflake_spark.streaming.ivf_stream import (  # noqa: E402
    IvfIndexSink,
)


def _files(root: str) -> dict[str, tuple[int, float]]:
    out = {}
    for r, _d, fs in os.walk(root):
        for f in fs:
            if f.endswith(".parquet"):
                p = os.path.join(r, f)
                st = os.stat(p)
                out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime)
    return out


def _written_bytes(before: dict, after: dict) -> int:
    return sum(
        sz for p, (sz, mt) in after.items() if before.get(p) != (sz, mt)
    )


def run_sink(mk_table, mk_sink, batches) -> list[int]:
    written = []
    table = mk_table()
    sink = mk_sink(table)
    for i, b in enumerate(batches):
        before = _files(table.path) if os.path.isdir(table.path) else {}
        sink(b, i)
        written.append(_written_bytes(before, _files(table.path)))
    return written


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="sink-io", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .persist()
    )
    n = docs.count()
    per = n // n_batches
    doc_batches = [
        docs.filter(
            (F.col("doc_id") >= i * per)
            & (F.col("doc_id") < (i + 1) * per)
        )
        for i in range(n_batches)
    ]
    emb = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .persist()
    )
    ne = emb.count()
    pere = ne // n_batches
    emb_batches = [
        emb.filter(
            (F.col("vec_id") >= i * pere) & (F.col("vec_id") < (i + 1) * pere)
        )
        for i in range(n_batches)
    ]
    work = tempfile.mkdtemp(prefix="sink_io_")
    cents = ParquetTable(work + "/cents")
    cents.overwrite_atomic(emb.orderBy("vec_id").limit(16))

    results = {}
    for layout, mk in (
        ("whole_table", lambda nm: ParquetTable(f"{work}/{nm}_flat")),
        (
            "bucketed_64",
            lambda nm: ParquetTable(
                f"{work}/{nm}_b", partition_by=[PART_COL], n_buckets=64
            ),
        ),
    ):
        w = run_sink(
            lambda nm="dedup", mk=mk, layout=layout: mk(nm + layout),
            lambda t: ExactDedupSink(t, "doc_id", "text"),
            doc_batches,
        )
        results[f"exact_dedup/{layout}"] = w
        w = run_sink(
            lambda nm="ivf", mk=mk, layout=layout: mk(nm + layout),
            lambda t: IvfIndexSink(t, cents),
            emb_batches,
        )
        results[f"ivf_index/{layout}"] = w

    print(json.dumps({"sf_dir": sf_dir, "n_batches": n_batches, "docs": n,
                      "vecs": ne}))
    for k, w in results.items():
        mb = [round(x / 1e6, 2) for x in w]
        print(f"{k:28s} per-trigger MB written: {mb}  total {sum(mb):.1f}")
    # headline: last-trigger ratio (state is largest there)
    for fam in ("exact_dedup", "ivf_index"):
        flat = results[f"{fam}/whole_table"][-1]
        buck = results[f"{fam}/bucketed_64"][-1]
        print(
            f"{fam}: final-trigger write {flat / 1e6:.2f} MB whole-table vs "
            f"{buck / 1e6:.2f} MB bucket-scoped ({flat / max(buck, 1):.1f}x)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
