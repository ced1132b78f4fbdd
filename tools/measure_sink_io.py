"""Measure per-trigger state-table write I/O: whole-table vs bucket-scoped.

VERDICT r11 next-step #1 asks for a before/after written-bytes number for
the streaming sinks' state folds. This drives the SAME sink class
(ExactDedupSink — additive fold, ledger-guarded in scoped mode; and
IvfIndexSink — keyed fold) over the same batches in both layouts and
reports, per trigger, the bytes of parquet files that were created or
changed under the state-table root.

The regime matters. A micro-batch touches one bucket per distinct key
hash, so with B batch keys and N buckets the expected rewrite is
``N * (1 - exp(-B/N))`` buckets ≈ ``min(B, N)`` — equal slices of the
whole corpus (B >> N) touch EVERY bucket and measure only layout
overhead. The regime the scoped fold exists for is steady-state
streaming: a large accumulated state taking small incremental triggers
(B << N), where per-trigger I/O is ~``B * state/N`` instead of
``state``. This script therefore seeds the state with most of the
corpus, then applies small increments and reports the increment
triggers' written bytes. Bucket count must scale with state (fixed
target bucket size) for the economics to hold at 100 TB — that is the
``n_buckets`` knob being swept here.

Run:  python tools/measure_sink_io.py [sf_dir] [n_incr] [inc_rows] [n_buckets]

Growth mode (``--growth``): the r12 verdict's open question — does
per-trigger I/O stay FLAT as state grows 10x? With a FIXED modulus it
cannot (trigger cost = touched_buckets x mean_bucket_size, and mean
bucket size grows with state); with ``rebucket_target_bytes`` set the
sink auto-splits to hold mean bucket size at the target, so probe-trigger
I/O stays ~touched_buckets x target. This mode grows the exact-dedup
state through 4 phases (~10x end to end), interleaving 3 small fixed-size
probe batches per phase, and reports per-phase probe write bytes for the
fixed layout vs the auto-rebucketing layout side by side.

Run:  python tools/measure_sink_io.py --growth [sf_dir] [probe_rows] [target_kb]
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


def _seed_plus_increments(df, id_col, n, n_incr, inc_rows):
    """[seed batch of everything above the increment range] + n_incr
    small batches of inc_rows distinct keys each — the steady-state
    streaming regime (large state, small triggers)."""
    lo = n_incr * inc_rows
    seed = df.filter(F.col(id_col) >= lo)
    return [seed] + [
        df.filter(
            (F.col(id_col) >= i * inc_rows)
            & (F.col(id_col) < (i + 1) * inc_rows)
        )
        for i in range(n_incr)
    ]


def growth_main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/testdata/sf1"
    probe_rows = int(args[1]) if len(args) > 1 else 20
    target_kb = int(args[2]) if len(args) > 2 else 16
    spark = get_spark(app_name="sink-io-growth", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import Row

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 40_000)
        .persist()
    )
    docs.count()
    # ~10x state growth end to end; probes are NEW unique keys each time
    # (inserts — the steady-state small-trigger shape)
    phases = [(0, 4_000), (4_000, 8_000), (8_000, 16_000), (16_000, 40_000)]

    def probe(pi: int, j: int):
        base = 10_000_000 + pi * 10_000 + j * 1_000
        return spark.createDataFrame(
            [
                Row(doc_id=base + i, text=f"probe document {base + i} body")
                for i in range(probe_rows)
            ]
        )

    work = tempfile.mkdtemp(prefix="sink_io_growth_")
    report = {}
    for layout, target in (
        ("fixed_32", None),
        (f"auto_{target_kb}KB", target_kb << 10),
    ):
        table = ParquetTable(
            f"{work}/{layout}", partition_by=[PART_COL], n_buckets=32
        )
        sink = ExactDedupSink(
            table, "doc_id", "text", rebucket_target_bytes=target
        )
        bid = 0
        phase_stats = []
        for pi, (lo, hi) in enumerate(phases):
            sink(
                docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ),
                bid,
            )
            bid += 1
            probes = []
            for j in range(3):
                before = _files(table.path)
                sink(probe(pi, j), bid)
                bid += 1
                probes.append(_written_bytes(before, _files(table.path)))
            state_bytes = sum(sz for sz, _m in _files(table.path).values())
            n_buckets = table.read_meta()["n_buckets"]
            phase_stats.append(
                {
                    "state_mb": round(state_bytes / 1e6, 2),
                    "n_buckets": n_buckets,
                    "probe_mb": [round(p / 1e6, 3) for p in probes],
                    "probe_mean_mb": round(
                        sum(probes) / len(probes) / 1e6, 3
                    ),
                }
            )
        report[layout] = phase_stats
    print(json.dumps({
        "mode": "growth", "sf_dir": sf_dir, "probe_rows": probe_rows,
        "target_kb": target_kb, "phases": [h for _l, h in phases],
    }))
    for layout, stats in report.items():
        print(f"\n{layout}:")
        for i, s in enumerate(stats):
            print(
                f"  phase {i}: state {s['state_mb']:7.2f} MB  "
                f"buckets {s['n_buckets']:4d}  "
                f"probe-writes MB {s['probe_mb']}  "
                f"mean {s['probe_mean_mb']}"
            )
    f0 = report["fixed_32"]
    a0 = report[f"auto_{target_kb}KB"]
    print(
        f"\nprobe-write slope phase0 -> phase3: fixed "
        f"{f0[-1]['probe_mean_mb'] / max(f0[0]['probe_mean_mb'], 1e-9):.1f}x"
        f" vs auto "
        f"{a0[-1]['probe_mean_mb'] / max(a0[0]['probe_mean_mb'], 1e-9):.1f}x"
        f" (state grew "
        f"{a0[-1]['state_mb'] / max(a0[0]['state_mb'], 1e-9):.1f}x)"
    )
    spark.stop()


def _all_file_bytes(root: str, suffix: str) -> int:
    total = 0
    for r, _d, fs in os.walk(root):
        for f in fs:
            if f.endswith(suffix):
                total += os.path.getsize(os.path.join(r, f))
    return total


def protocol_main() -> None:
    """``--protocol``: the rename commit (ParquetTable) vs the manifest PUT
    commit (ManifestTable) on the identical steady-state scoped workload —
    per-increment parquet write bytes, commit-metadata bytes, and wall
    seconds. Quantifies the round-14 claim that the object-store protocol
    costs nothing on the data path: parquet I/O should be identical
    (same scoped merge plan lands in both layouts) and the protocol delta
    should be confined to small JSON commit objects.

    Run:  python tools/measure_sink_io.py --protocol [sf_dir] [n_incr] [inc_rows] [n_buckets]
    """
    import time

    from financial_data_ingestion_canonical_snowflake_spark.operators.manifest import (
        ManifestTable,
    )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/testdata/sf1"
    n_incr = int(args[1]) if len(args) > 1 else 6
    inc_rows = int(args[2]) if len(args) > 2 else 100
    n_buckets = int(args[3]) if len(args) > 3 else 64
    spark = get_spark(app_name="sink-io-protocol", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50_000)
        .persist()
    )
    n = docs.count()
    batches = _seed_plus_increments(docs, "doc_id", n, n_incr, inc_rows)
    work = tempfile.mkdtemp(prefix="sink_io_proto_")

    report = {}
    for proto, mk in (
        (
            "rename",
            lambda: ParquetTable(
                f"{work}/rn", partition_by=[PART_COL], n_buckets=n_buckets
            ),
        ),
        (
            "manifest",
            lambda: ManifestTable(
                f"{work}/mf", partition_by=[PART_COL], n_buckets=n_buckets
            ),
        ),
    ):
        table = mk()
        sink = ExactDedupSink(table, "doc_id", "text")
        rows = []
        for i, b in enumerate(batches):
            before = _files(table.path) if os.path.isdir(table.path) else {}
            meta_before = _all_file_bytes(table.path, ".json") if os.path.isdir(table.path) else 0
            t0 = time.perf_counter()
            sink(b, i)
            wall = time.perf_counter() - t0
            # the pointer object is REWRITTEN whole each commit — its full
            # size (not the growth delta) is the per-commit PUT volume,
            # and the number that scales with layout width (leaf count),
            # not with the trigger's delta. This is the dir-granular
            # manifest's scaling seam (VERDICT r14 next-step #4).
            mpath = os.path.join(table.path, "_MANIFEST.json")
            rows.append(
                {
                    "parquet_mb": round(
                        _written_bytes(before, _files(table.path)) / 1e6, 3
                    ),
                    "commit_json_b": _all_file_bytes(table.path, ".json")
                    - meta_before,
                    "manifest_obj_b": (
                        os.path.getsize(mpath) if os.path.isfile(mpath) else 0
                    ),
                    "wall_s": round(wall, 2),
                }
            )
        report[proto] = {
            "triggers": rows,
            "final_state_mb": round(
                sum(sz for sz, _m in _files(table.path).values()) / 1e6, 2
            ),
            "final_files": len(_files(table.path)),
        }
    print(json.dumps({
        "mode": "protocol", "sf_dir": sf_dir, "docs": n,
        "n_incr": n_incr, "inc_rows": inc_rows, "n_buckets": n_buckets,
        "report": report,
    }, indent=1))
    # headline: mean increment-trigger numbers (trigger 0 is the seed)
    for proto, r in report.items():
        inc = r["triggers"][1:]
        mean = lambda k: sum(t[k] for t in inc) / max(len(inc), 1)  # noqa: E731
        print(
            f"{proto:9s} mean increment: parquet {mean('parquet_mb'):.3f} MB, "
            f"commit-json {mean('commit_json_b'):.0f} B, "
            f"manifest-PUT {mean('manifest_obj_b'):.0f} B, "
            f"wall {mean('wall_s'):.2f} s; "
            f"final state {r['final_state_mb']} MB in {r['final_files']} files"
        )
    spark.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1"
    n_incr = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    inc_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
    spark = get_spark(app_name="sink-io", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .persist()
    )
    n = docs.count()
    doc_batches = _seed_plus_increments(docs, "doc_id", n, n_incr, inc_rows)
    emb = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .persist()
    )
    ne = emb.count()
    emb_batches = _seed_plus_increments(emb, "vec_id", ne, n_incr, inc_rows)
    work = tempfile.mkdtemp(prefix="sink_io_")
    cents = ParquetTable(work + "/cents")
    cents.overwrite_atomic(emb.orderBy("vec_id").limit(16))

    results = {}
    for layout, mk in (
        ("whole_table", lambda nm: ParquetTable(f"{work}/{nm}_flat")),
        (
            f"bucketed_{n_buckets}",
            lambda nm: ParquetTable(
                f"{work}/{nm}_b", partition_by=[PART_COL], n_buckets=n_buckets
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

    print(json.dumps({
        "sf_dir": sf_dir, "n_incr": n_incr, "inc_rows": inc_rows,
        "n_buckets": n_buckets, "docs": n, "vecs": ne,
    }))
    for k, w in results.items():
        mb = [round(x / 1e6, 2) for x in w]
        print(
            f"{k:28s} seed write {mb[0]} MB; "
            f"per-increment MB written: {mb[1:]}  incr total {sum(mb[1:]):.2f}"
        )
    # headline: mean increment-trigger ratio (the steady-state cost)
    for fam in ("exact_dedup", "ivf_index"):
        flat = sum(results[f"{fam}/whole_table"][1:]) / n_incr
        buck = sum(results[f"{fam}/bucketed_{n_buckets}"][1:]) / n_incr
        print(
            f"{fam}: mean increment write {flat / 1e6:.2f} MB whole-table vs "
            f"{buck / 1e6:.2f} MB bucket-scoped ({flat / max(buck, 1):.1f}x)"
        )
    spark.stop()


if __name__ == "__main__":
    if "--growth" in sys.argv:
        growth_main()
    elif "--protocol" in sys.argv:
        protocol_main()
    else:
        main()
