#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against views named
after the testdata tables, and compares: row count, column names (sorted),
and exact values after sorting columns by name and rows lexicographically.
"""
import sys, os, json, math
import duckdb

# DuckDB version pin (r8 advice): the similarity_ivf_recall oracle's cell
# assignment depends on list_dot_product accumulating left-to-right in
# double (no rounding washout, unlike the 4dp cosine scores) — a DuckDB
# build that reorders the accumulation (SIMD/pairwise summation) could flip
# near-tie assignments. 1.0.0 is what this container and the driver run.
PINNED_DUCKDB = "1.0.0"
if duckdb.__version__ != PINNED_DUCKDB:
    print(f"WARNING: duckdb {duckdb.__version__} != pinned {PINNED_DUCKDB}; "
          "exact-accumulation oracles (similarity_ivf_recall) may drift",
          file=sys.stderr)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    """Sort columns by name, then rows; stringify values canonically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cv(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return str(v)

    out = [tuple(cv(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def pandas_mimic(con, spark_path, sql):
    """Mimic the driver's pandas-hash comparator path.

    The driver fetches both sides as pandas DataFrames and hashes values.
    Two failure classes the fetchall() compare above cannot see:
      * dtype drift — e.g. DuckDB SUM(BIGINT) returns HUGEINT, which
        pandas converts to float64 (54.0) while the Spark parquet reads
        back int64 (54); value-equal, hash-different (r7 sketch_cms_topk)
      * unhashable object cells — e.g. ARRAY columns become numpy arrays
        (r6 nest_collect "unhashable type")
    Returns an error string, or None if the mimic agrees.
    """
    import pandas as pd
    sp = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
    du = con.sql(sql).df()
    sp = sp[sorted(sp.columns)]
    du = du[sorted(du.columns)]
    for c in sp.columns:
        ks, kd = sp[c].dtype.kind, du[c].dtype.kind
        if ks != kd:
            return f"dtype kind mismatch on '{c}': spark={sp[c].dtype} duck={du[c].dtype}"
    try:
        hs = pd.util.hash_pandas_object(sp, index=False)
        hd = pd.util.hash_pandas_object(du, index=False)
    except TypeError as e:
        return f"unhashable column: {e}"
    if sorted(hs.tolist()) != sorted(hd.tolist()):
        return "pandas row-hash mismatch"
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            sp = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'")
            sp_cols, sp_rows = [d[0] for d in sp.description], sp.fetchall()
            du = con.sql(sql)
            du_cols, du_rows = [d[0] for d in du.description], du.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(sp_cols) != sorted(du_cols):
            print(f"FAIL {name}: cols spark={sorted(sp_cols)} duck={sorted(du_cols)}")
            n_fail += 1
            continue
        if len(sp_rows) != len(du_rows):
            print(f"FAIL {name}: rows spark={len(sp_rows)} duck={len(du_rows)}")
            n_fail += 1
            continue
        a, b = canon(sp_rows, sp_cols), canon(du_rows, du_cols)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
            continue
        err = pandas_mimic(con, spark_path, sql)
        if err:
            print(f"FAIL {name}: driver-mimic: {err}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sp_rows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
