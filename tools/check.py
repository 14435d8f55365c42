#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (driver-side tools only:
duckdb/pandas/pyarrow — NOT shipped in the engine).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each query in oracle_sql.json: run the SQL in DuckDB over the fixture
tables, load the Spark parquet result, canonicalize (columns sorted by name,
rows sorted by all columns), and compare cell-by-cell. STRICT: floats must
match BIT-EXACTLY — the driver hashes exact rendered values, so a
"float-near" cell (within 1e-12 relative) is a FAILURE here too; it is
counted and labeled separately only so the failure mode is recognizable.
"""
import glob, json, math, sys
import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pyarrow.types as pat

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify unhashable cells (lists/arrays) for sorting
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def cells_equal(a, b):
    """True (exact), "float-near" (within 1e-12 relative), or False."""
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == b:
            return True
        if abs(a - b) <= 1e-12 * max(1.0, abs(a), abs(b)):
            return "float-near"
        return False
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b

def selftest():
    # Regression for the truthy-tuple bug: a 1e-6 relative drift MUST be
    # False (gate fails), not a truthy (False, "float-near") tuple.
    assert cells_equal(1.0, 1.0 + 1e-6) is False
    assert cells_equal(1.0, 1.0) is True
    assert cells_equal(1.0, 1.0 + 1e-13) == "float-near"
    assert cells_equal(float("nan"), float("nan")) is True
    assert cells_equal(None, None) is True
    assert cells_equal("a", "b") is False
    # STRICT policy: a float-near cell fails a query (the driver hashes
    # exact values, so ulp drift that this gate forgave would red there).
    assert judge(bad=0, near=1) == "fail"
    assert judge(bad=0, near=0) == "ok"
    assert judge(bad=1, near=0) == "fail"
    print("selftest OK")

def judge(bad, near):
    """STRICT verdict for one query: any exact-diff OR float-near cell
    fails — the driver's hash gate sees exact values only."""
    return "fail" if (bad or near) else "ok"

def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest(); return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:
            failures.append(name); print(f"FAIL {name}: oracle SQL error: {e}"); continue
        try:
            got = canon(duckdb.connect().execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            failures.append(name); print(f"FAIL {name}: spark result unreadable: {e}"); continue
        if list(exp.columns) != list(got.columns):
            failures.append(name)
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            continue
        if len(exp) != len(got):
            failures.append(name)
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            continue
        bad = near = 0
        first_bad = first_near = None
        for c in exp.columns:
            # Fast path: a column that is pandas-equal (dtype-aware,
            # NaN-positions-equal) has zero diff cells by construction, so
            # the per-cell loop can only confirm that. Any column that is
            # NOT .equals()-equal (including dtype mismatches) still takes
            # the full per-cell path, so every failure diagnosis — exact
            # vs float-near, first-diff samples — is unchanged. This keeps
            # the strict gate tractable on 10^7-row replica sweeps.
            if exp[c].equals(got[c]):
                continue
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i in range(len(ev)):
                r = cells_equal(ev[i], gv[i])
                if r is True or r == 1:  # True, or numpy bool_ from a == b
                    continue
                if r == "float-near":
                    near += 1
                    if first_near is None:
                        first_near = (c, i, ev[i], gv[i])
                    continue
                bad += 1
                if first_bad is None:
                    first_bad = (c, i, ev[i], gv[i])
        if judge(bad, near) == "fail":
            failures.append(name)
            detail = f"{bad} cell diffs, {near} float-near (STRICT: near = fail)"
            # prefer the exact-diff sample: it is the severe failure mode
            first = first_bad if bad > 0 else first_near
            if first is not None:
                kind = "exact-diff" if bad > 0 else "float-near"
                detail += (f", e.g. ({kind}) col={first[0]} row={first[1]}"
                           f" exp={first[2]!r} got={first[3]!r}")
            print(f"FAIL {name}: {detail}")
        else:
            print(f"OK   {name}: {len(exp)} rows")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} oracle queries match")
    lint = null_decimal_lint(out_dir)
    sys.exit(1 if (failures or lint) else 0)

def null_decimal_lint(out_dir):
    """Flag any result parquet containing a NULL cell in a DECIMAL column —
    the only output class that has ever hash-diverged at the driver (r11
    verdict: Q12/Q20/Q65/Q81/Q98 all emitted NULL decimals; no green query
    did). Scans EVERY query result in out_dir, oracle-checked or not, so
    new queries can't silently join the class."""
    flagged = []
    for d in sorted(glob.glob(f"{out_dir}/q_*")):
        name = d.rsplit("/", 1)[-1]
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            continue
        null_dec_cols = set()
        for f in files:
            t = pq.read_table(f)
            for i, field in enumerate(t.schema):
                if pat.is_decimal(field.type) and t.column(i).null_count > 0:
                    null_dec_cols.add(field.name)
        if null_dec_cols:
            flagged.append(name)
            print(f"LINT {name}: NULL cells in DECIMAL column(s) "
                  f"{sorted(null_dec_cols)} — cast to DOUBLE at the output "
                  f"boundary (r11 NULL-decimal hash-divergence class)")
    if flagged:
        print(f"LINT: {len(flagged)} quer{'y' if len(flagged)==1 else 'ies'} "
              f"emit NULL decimals: {flagged}")
    else:
        print("LINT: no NULL-decimal cells in any result")
    return flagged

if __name__ == "__main__":
    main()
