#!/usr/bin/env python3
"""Scale the driver fixtures up by integer replication (driver-side tool,
same category as check.py — never engine code).

Builds <dst>/<table>.parquet as K key-offset closed-world copies of
<src>: dimension tables (region, nation) copy verbatim; every scaling
table's surrogate and FK keys shift by replica*`(parent max key + 1)`, so
joins stay exactly as selective per replica and the union is K disjoint
consistent worlds. String/date/float cell VALUES are byte-identical
copies — the point is Spark-vs-DuckDB AGREEMENT at 10x the volume
(precision, rounding, tie-break drift), not new distributions. Total
orders survive: every ORDER BY tie-break in the suite ends on a key
column, and keys differ across replicas.

Usage: fixture_scale.py <srcDir> <dstDir> <K> [tables]
e.g.   fixture_scale.py /root/testdata/sf0.1 /tmp/graft_fixture_sf1/sf1 10
       fixture_scale.py /root/testdata/sf0.1 /tmp/graft_ann_2m/sf100 1000 embeddings
(the optional comma-separated table list restricts the build — the ANN
decade rungs need only the embeddings corpus, not 1000 lineitem copies)
"""
import sys
import os
import duckdb

COPY = ["region", "nation"]
# table -> {key column -> parent (table, key) whose max defines the offset}
OFFSET = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {"o_orderkey": ("orders", "o_orderkey"),
               "o_custkey": ("customer", "c_custkey")},
    "lineitem": {"l_orderkey": ("orders", "o_orderkey"),
                 "l_partkey": ("part", "p_partkey"),
                 "l_suppkey": ("supplier", "s_suppkey")},
    "events": {"event_id": ("events", "event_id"),
               "user_id": ("events", "user_id")},
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}


def main(src, dst, k, only=None):
    if only:
        unknown = only - set(COPY) - set(OFFSET)
        if unknown:
            sys.exit(f"[fixture_scale] unknown table(s): {sorted(unknown)} "
                     f"(known: {sorted(set(COPY) | set(OFFSET))})")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    bases = {}  # (table, col) -> offset base

    def base(tbl, col):
        if (tbl, col) not in bases:
            bases[(tbl, col)] = con.execute(
                f"SELECT max({col}) + 1 FROM "
                f"parquet_scan('{src}/{tbl}.parquet')").fetchone()[0]
        return bases[(tbl, col)]

    for tbl in COPY:
        if only and tbl not in only:
            continue
        con.execute(f"COPY (SELECT * FROM parquet_scan('{src}/{tbl}.parquet'))"
                    f" TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)")
        print(f"[fixture_scale] {tbl}: copied")

    for tbl, keys in OFFSET.items():
        if only and tbl not in only:
            continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM parquet_scan('{src}/{tbl}.parquet')"
        ).fetchall()]
        sel = ", ".join(
            f"{c} + r.i * {base(*keys[c])} AS {c}" if c in keys else c
            for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM parquet_scan('{src}/{tbl}.parquet') "
            f"CROSS JOIN range({k}) r(i)) "
            f"TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM parquet_scan('{dst}/{tbl}.parquet')"
        ).fetchone()[0]
        print(f"[fixture_scale] {tbl}: {n} rows ({k} replicas)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]),
         set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None)
