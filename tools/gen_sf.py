"""Generate a driver-SCALE synthetic dataset (schema-compatible with
/root/testdata/sf*) for optimization measurement at larger scale factors.

The driver's round-end bench may run at a larger driver-generated sf (r5:
sf=1.0). This tool produces a statistically similar dataset (same schemas,
same row-count scaling, similar text/duplicate structure) so optimizations
can be tuned at that scale. NOT the driver's data — used only for local
measurement; correctness is checked against the real sf dirs.

Usage: python tools/gen_sf.py <out_dir> <sf>
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark batch part line column order small sort fast value scan hash slow "
    "group agg filter query big key window row table stream merge data a the "
    "join vector customer supplier region nation index shuffle cache disk"
).split()


def gen_documents(out, sf, rng):
    n = int(5000 * sf / 0.1)
    lens = rng.integers(15, 95, size=n)
    texts = []
    for i in range(n):
        toks = rng.choice(VOCAB, size=lens[i])
        texts.append(" ".join(toks))
    # near-dup structure: ~5% of docs are mutated copies of an earlier doc
    n_dup = n // 20
    for _ in range(n_dup):
        i = int(rng.integers(0, n))
        j = int(rng.integers(0, n))
        toks = texts[j].split()
        k = max(1, len(toks) // 20)
        for _m in range(int(rng.integers(0, k + 1))):
            toks[int(rng.integers(0, len(toks)))] = str(rng.choice(VOCAB))
        texts[i] = " ".join(toks)
    langs = rng.choice(["en", "zh", "es", "fr", "de"], size=n, p=[0.41, 0.15, 0.15, 0.15, 0.14])
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array([f"src{i % 20}" for i in range(n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))


def gen_embeddings(out, sf, rng):
    n = int(2000 * sf / 0.1)
    dim = 64
    base = rng.standard_normal((n, dim)).astype(np.float32)
    # clusters of near-identical vectors (near-dup structure)
    for _ in range(n // 40):
        i, j = rng.integers(0, n, size=2)
        base[i] = base[j] + rng.standard_normal(dim).astype(np.float32) * 0.01
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(base), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 8, size=n), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))


def gen_events(out, sf, rng):
    n = int(100000 * sf / 0.1)
    ts0 = np.datetime64("2024-01-01T00:00:00")
    ts = ts0 + rng.integers(0, 90 * 86400, size=n).astype("timedelta64[s]")
    value = rng.uniform(0, 1000, size=n)
    value[rng.random(n) < 0.05] = np.nan
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(rng.integers(0, max(1, n // 20), size=n), pa.int64()),
            "event_type": pa.array(rng.choice(["click", "view", "buy", "scroll"], size=n)),
            "value": pa.array(np.where(np.isnan(value), None, value), pa.float64(), from_pandas=True),
            "props": pa.array(['{"k": %d}' % v for v in rng.integers(0, 100, size=n)]),
        }
    )
    pq.write_table(tbl, os.path.join(out, "events.parquet"))


def gen_tpch(out, sf, rng):
    n_li = int(600000 * sf / 0.1)
    n_ord = int(150000 * sf / 0.1)
    n_cust = int(15000 * sf / 0.1)
    n_part = int(20000 * sf / 0.1)
    n_supp = int(1000 * sf / 0.1)
    d0 = np.datetime64("1992-01-01")
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, size=n_ord), pa.int64()),
            "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], size=n_ord, p=[0.48, 0.48, 0.04])),
            "o_totalprice": pa.array(rng.uniform(1000, 450000, size=n_ord)),
            "o_orderdate": pa.array(
                (d0 + rng.integers(0, 2400, size=n_ord).astype("timedelta64[D]")).astype(
                    "datetime64[us]"
                )
            ),
            "o_orderpriority": pa.array(rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"], size=n_ord)),
        }
    )
    pq.write_table(orders, os.path.join(out, "orders.parquet"))
    li = pa.table(
        {
            "l_orderkey": pa.array(rng.integers(0, n_ord, size=n_li), pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, size=n_li), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, size=n_li), pa.int64()),
            "l_linenumber": pa.array(rng.integers(1, 8, size=n_li), pa.int32()),
            "l_quantity": pa.array(rng.integers(1, 51, size=n_li).astype(np.float64)),
            "l_extendedprice": pa.array(rng.uniform(900, 100000, size=n_li)),
            "l_discount": pa.array(rng.integers(0, 11, size=n_li) / 100.0),
            "l_tax": pa.array(rng.integers(0, 9, size=n_li) / 100.0),
            "l_returnflag": pa.array(rng.choice(["A", "N", "R"], size=n_li)),
            "l_linestatus": pa.array(rng.choice(["F", "O"], size=n_li)),
            "l_shipdate": pa.array(
                (d0 + rng.integers(0, 2500, size=n_li).astype("timedelta64[D]")).astype(
                    "datetime64[us]"
                )
            ),
        }
    )
    pq.write_table(li, os.path.join(out, "lineitem.parquet"))
    cust = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
            "c_nationkey": pa.array(rng.integers(0, 25, size=n_cust), pa.int32()),
            "c_acctbal": pa.array(rng.uniform(-999, 9999, size=n_cust)),
            "c_mktsegment": pa.array(
                rng.choice(["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"], size=n_cust)
            ),
        }
    )
    pq.write_table(cust, os.path.join(out, "customer.parquet"))
    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(n_part), pa.int64()),
            "p_name": pa.array([f"part {i}" for i in range(n_part)]),
            "p_brand": pa.array(rng.choice([f"Brand#{i}" for i in range(1, 6)], size=n_part)),
            "p_retailprice": pa.array(rng.uniform(900, 2000, size=n_part)),
        }
    )
    pq.write_table(part, os.path.join(out, "part.parquet"))
    supp = pa.table(
        {
            "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
            "s_nationkey": pa.array(rng.integers(0, 25, size=n_supp), pa.int32()),
        }
    )
    pq.write_table(supp, os.path.join(out, "supplier.parquet"))
    nation = pa.table(
        {
            "n_nationkey": pa.array(np.arange(25), pa.int32()),
            "n_name": pa.array([f"NATION{i}" for i in range(25)]),
            "n_regionkey": pa.array(np.arange(25) % 5, pa.int32()),
        }
    )
    pq.write_table(nation, os.path.join(out, "nation.parquet"))
    region = pa.table(
        {
            "r_regionkey": pa.array(np.arange(5), pa.int32()),
            "r_name": pa.array([f"REGION{i}" for i in range(5)]),
        }
    )
    pq.write_table(region, os.path.join(out, "region.parquet"))


def main():
    out = sys.argv[1]
    sf = float(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(7)
    gen_documents(out, sf, rng)
    gen_embeddings(out, sf, rng)
    gen_events(out, sf, rng)
    gen_tpch(out, sf, rng)
    print(f"wrote {out} at sf={sf}")


if __name__ == "__main__":
    main()
