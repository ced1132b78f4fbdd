"""Re-measure the adaptive-simhash staircase at the next decade.

VERDICT r11 what's-wrong #3: the sf3->sf10 step of
``ns_dedup_simhash_adaptive`` measured 5.6x for 3.33x data — documented
as the <=256 bucket-width STAIRCASE of ``adaptive_prefix_bits`` (width
= n / 2**bits sawtooths between ~128 and ~256 as bits increments), not
quadratic growth. The falsifiable prediction: at the NEXT decade the
staircase resets — bits(150k)=10 -> width 146, bits(500k)=11 -> width
244 (the expensive top of the tooth), bits(1.5M)=13 -> width 183 (reset
past the skipped 12) — so the 500k->1.5M step should come in WELL under
its 3x data multiple, which a genuinely quadratic path cannot do.

Generates documents-ONLY corpora (same distribution/seed discipline as
tools/gen_testdata_sf.py) at n = 150k / 500k / 1.5M and times the
production operator ``simhash_pairs(prefix_bits="adaptive")`` (n reps,
min reported, noop sink — the bench discipline).

Run:  python tools/measure_simhash_staircase.py [reps]
"""

from __future__ import annotations

import gc
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_data_ingestion_canonical_snowflake_spark.operators import (  # noqa: E402
    text_dedup as td,
)
from financial_data_ingestion_canonical_snowflake_spark.session import (  # noqa: E402
    get_spark,
)
from tools.gen_testdata_sf import SEED, VOCAB  # noqa: E402

NS = [150_000, 500_000, 1_500_000]


def gen_docs(n: int, path: str) -> None:
    if os.path.exists(path):
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(SEED)
    lens = rng.integers(10, 101, n)
    texts = [" ".join(VOCAB[rng.integers(0, len(VOCAB), ln)]) for ln in lens]
    for i in range(0, n, 625):  # exact-dup injection, as the sf generator
        if i + 1 < n:
            texts[i + 1] = texts[i]
    pq.write_table(
        pa.table(
            {"doc_id": np.arange(n, dtype=np.int64), "text": texts},
            schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        ),
        path,
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="simhash-staircase")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for n in NS:
        path = f"/tmp/staircase/n{n}/documents.parquet"
        gen_docs(n, path)
        docs = spark.read.parquet(path)
        bits = td.adaptive_prefix_bits(n)
        runs = []
        for _ in range(reps):
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            td.simhash_pairs(docs, "doc_id", "text", max_hamming=6).write.format(
                "noop"
            ).mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 2))
        results[n] = {
            "bits": bits,
            "expected_width": round(n / 2**bits, 1),
            "runs": runs,
            "min_s": min(runs),
        }
        print(n, results[n], flush=True)
    for a, b in zip(NS, NS[1:]):
        print(
            f"{a}->{b}: data x{b / a:.2f}, time x"
            f"{results[b]['min_s'] / results[a]['min_s']:.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
