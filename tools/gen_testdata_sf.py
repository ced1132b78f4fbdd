"""Deterministic testdata generator for scale factors the driver doesn't
ship (TESTDATA.md provides sf0.001/0.01/0.1 read-only; the scale-slope
bench needs sf1). Matches the driver tables' SCHEMAS exactly and their
value distributions approximately — good for runtime-slope measurement,
not for oracle-hash comparison against driver-generated dirs.

Usage:
    python tools/gen_testdata_sf.py 1 /tmp/testdata/sf1

Row counts scale linearly from the sf0.1 shapes (region/nation fixed):
customer 15k/sf0.01x10, supplier 1k, part 20k, orders 150k, lineitem
600k, events 100k, documents 5k, embeddings 2k — all x(sf/0.1).
Seeded numpy (seed 42), chunked pyarrow writes so sf1 (6M lineitem)
stays under a few hundred MB of peak memory.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB = np.array(
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window".split()
)
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
SEGMENTS = np.array(
    ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
)
STATUSES = np.array(["F", "O", "P"])
PRIORITIES = np.array(
    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
)
EVENT_TYPES = np.array(["click", "view", "signup", "purchase", "error"])
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
PART_ADJ = np.array("large hot blue small red green shiny dull".split())
PART_NOUN = np.array("ring bolt screw nut gear cap rod pin".split())
PART_TYPES = np.array(["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO"])

US_DAY = 86_400_000_000

#: id namespace of the generator's injected near-dup embedding twins —
#: beyond any realistic corpus id, and disjoint from the registry's
#: in-query synthetic domain (SYNTH_ID_OFFSET = 1e12; in-query twins
#: derive only from vec_id < 25, so 5e11 + i never collides)
GEN_TWIN_OFFSET = 500_000_000_000


def _ts_us(rng: np.random.Generator, n: int, lo_us: int, hi_us: int) -> np.ndarray:
    return rng.integers(lo_us, hi_us, n, dtype=np.int64)


def _write(path: str, name: str, cols: dict, schema: pa.Schema) -> None:
    t = pa.Table.from_pydict(cols, schema=schema)
    pq.write_table(t, os.path.join(path, f"{name}.parquet"))


def generate(sf: float, out_dir: str) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    k = sf / 0.1  # multiplier vs the sf0.1 shapes
    n_cust = int(15_000 * k)
    n_supp = int(1_000 * k)
    n_part = int(20_000 * k)
    n_ord = int(150_000 * k)
    n_li = int(600_000 * k)
    n_ev = int(100_000 * k)
    n_doc = int(5_000 * k)
    n_emb = int(2_000 * k)
    rng = np.random.default_rng(SEED)
    ts = pa.timestamp("us")

    _write(
        out_dir,
        "region",
        {"r_regionkey": list(range(5)), "r_name": REGIONS},
        pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]),
    )
    _write(
        out_dir,
        "nation",
        {
            "n_nationkey": list(range(25)),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": [i % 5 for i in range(25)],
        },
        pa.schema(
            [
                ("n_nationkey", pa.int32()),
                ("n_name", pa.string()),
                ("n_regionkey", pa.int32()),
            ]
        ),
    )
    _write(
        out_dir,
        "customer",
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": rng.integers(0, 25, n_cust, dtype=np.int32),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
            "c_mktsegment": SEGMENTS[rng.integers(0, 5, n_cust)],
        },
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_nationkey", pa.int32()),
                ("c_acctbal", pa.float64()),
                ("c_mktsegment", pa.string()),
            ]
        ),
    )
    _write(
        out_dir,
        "supplier",
        {
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": rng.integers(0, 25, n_supp, dtype=np.int32),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
        },
        pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("s_nationkey", pa.int32()),
                ("s_acctbal", pa.float64()),
            ]
        ),
    )
    _write(
        out_dir,
        "part",
        {
            "p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": [
                f"{PART_ADJ[i % 8]} {PART_NOUN[(i // 8) % 8]}"
                for i in range(n_part)
            ],
            "p_brand": [f"Brand#{i % 25}" for i in range(n_part)],
            "p_type": PART_TYPES[rng.integers(0, 5, n_part)],
            "p_size": rng.integers(1, 51, n_part, dtype=np.int32),
            "p_retailprice": np.round(900 + 0.1 * np.arange(n_part) % 1100, 2),
        },
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_name", pa.string()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int32()),
                ("p_retailprice", pa.float64()),
            ]
        ),
    )

    d1995 = np.datetime64("1995-01-01", "us").astype(np.int64)
    d2001 = np.datetime64("2001-08-01", "us").astype(np.int64)
    o_dates = (
        d1995 + (_ts_us(rng, n_ord, 0, d2001 - d1995) // US_DAY) * US_DAY
    )
    _write(
        out_dir,
        "orders",
        {
            "o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_ord, dtype=np.int64),
            "o_orderstatus": STATUSES[rng.integers(0, 3, n_ord)],
            "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
            "o_orderdate": o_dates,
            "o_orderpriority": PRIORITIES[rng.integers(0, 5, n_ord)],
        },
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", ts),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )

    # lineitem: ~4 lines per order, chunked writes
    writer = None
    li_schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("l_partkey", pa.int64()),
            ("l_suppkey", pa.int64()),
            ("l_linenumber", pa.int32()),
            ("l_quantity", pa.float64()),
            ("l_extendedprice", pa.float64()),
            ("l_discount", pa.float64()),
            ("l_tax", pa.float64()),
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("l_shipdate", ts),
        ]
    )
    chunk = 1_000_000
    for lo in range(0, n_li, chunk):
        n = min(chunk, n_li - lo)
        okey = rng.integers(0, n_ord, n, dtype=np.int64)
        ship = (
            d1995
            + (_ts_us(rng, n, US_DAY, d2001 - d1995 + 95 * US_DAY) // US_DAY)
            * US_DAY
        )
        cols = {
            "l_orderkey": okey,
            "l_partkey": rng.integers(0, n_part, n, dtype=np.int64),
            "l_suppkey": rng.integers(0, n_supp, n, dtype=np.int64),
            "l_linenumber": ((lo + np.arange(n)) % 7 + 1).astype(np.int32),
            "l_quantity": rng.integers(1, 51, n).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, n), 2),
            "l_discount": np.round(rng.integers(0, 11, n) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n) / 100.0, 2),
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n)],
            "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n)],
            "l_shipdate": ship,
        }
        t = pa.Table.from_pydict(cols, schema=li_schema)
        if writer is None:
            writer = pq.ParquetWriter(
                os.path.join(out_dir, "lineitem.parquet"), li_schema
            )
        writer.write_table(t)
    if writer is not None:
        writer.close()

    e0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    e1 = np.datetime64("2024-01-31", "us").astype(np.int64)
    kvals = rng.integers(0, 100, n_ev)
    _write(
        out_dir,
        "events",
        {
            "event_id": np.arange(n_ev, dtype=np.int64),
            "ts": np.sort(_ts_us(rng, n_ev, e0, e1)),
            "user_id": rng.integers(0, int(1500 * k), n_ev, dtype=np.int64),
            "event_type": EVENT_TYPES[rng.integers(0, 5, n_ev)],
            "value": np.round(rng.exponential(50.0, n_ev), 2),
            "props": [json.dumps({"k": int(v)}) for v in kvals],
        },
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", ts),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )

    # documents: 10-100 vocab words (driver dist: uniform tokens, avg ~54
    # words / 297 chars); ~0.2% exact duplicates
    lens = rng.integers(10, 101, n_doc)
    texts = [
        " ".join(VOCAB[rng.integers(0, len(VOCAB), ln)]) for ln in lens
    ]
    for i in range(0, n_doc, 625):  # inject exact dups like the driver data
        if i + 1 < n_doc:
            texts[i + 1] = texts[i]
    _write(
        out_dir,
        "documents",
        {
            "doc_id": np.arange(n_doc, dtype=np.int64),
            "text": texts,
            "lang": LANGS[rng.choice(5, n_doc, p=LANG_P)],
            "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        },
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
    )

    # embeddings: unit-norm near-random 64-dim vectors with a FAINT label
    # tilt — matching the driver fixture's dispersion (intra-label cosine
    # mean ~0, max pairwise ~0.5, norm 1.0). A tightly-clustered generator
    # here quadratically inflates every near-dup pair set and poisons the
    # scale-slope measurement (observed: 84x on ns_vector_near_dup).
    dim, n_lab = 64, 10
    centers = rng.normal(0, 1.0, (n_lab, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_lab, n_emb).astype(np.int32)
    raw = rng.normal(0, 1.0, (n_emb, dim)) + 0.25 * centers[labels]
    vecs = (raw / np.linalg.norm(raw, axis=1, keepdims=True)).astype(
        np.float32
    )
    # deterministic near-dup TWINS (~0.2%, ids at GEN_TWIN_OFFSET + i):
    # a perturbed copy of vector i with cosine ~0.99 against its source,
    # so the near-dup/semantic-dedup families have a non-empty, scale-
    # proportional true-positive set at every generated sf (VERDICT r12:
    # sf3 certified those families on 0-row agreement only). Drawn AFTER
    # every base draw, so base vectors stay byte-identical to earlier
    # rounds' generations; the offset clears every realistic corpus while
    # staying outside the in-query synthetic domain (registry
    # SYNTH_ID_OFFSET twins derive only from vec_id < 25).
    n_twin = max(8, n_emb // 500)
    noise = rng.normal(0, 1.0, (n_twin, dim))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    twin_raw = vecs[:n_twin].astype(np.float64) + 0.12 * noise
    twins = (
        twin_raw / np.linalg.norm(twin_raw, axis=1, keepdims=True)
    ).astype(np.float32)
    _write(
        out_dir,
        "embeddings",
        {
            "vec_id": np.concatenate(
                [
                    np.arange(n_emb, dtype=np.int64),
                    GEN_TWIN_OFFSET + np.arange(n_twin, dtype=np.int64),
                ]
            ),
            "embedding": list(vecs) + list(twins),
            "label": np.concatenate([labels, labels[:n_twin]]),
        },
        pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
    )
    return {
        "region": 5, "nation": 25, "customer": n_cust, "supplier": n_supp,
        "part": n_part, "orders": n_ord, "lineitem": n_li, "events": n_ev,
        "documents": n_doc, "embeddings": n_emb + n_twin,
    }


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/testdata/sf{sf:g}"
    rows = generate(sf, out)
    print(json.dumps({"sf": sf, "dir": out, "rows": rows}))
