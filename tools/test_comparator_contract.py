#!/usr/bin/env python3
"""Contract test for the driver-comparator mimic in compare_oracle.py.

Seeds the two regression classes the pandas-hash mimic exists to catch and
asserts that (a) the primary fetchall/canon compare is BLIND to each (so
without the mimic the gate would silently pass locally and fail at the
driver), and (b) pandas_mimic red-flags each.

  1. HUGEINT dtype drift: DuckDB SUM(BIGINT) -> HUGEINT -> pandas float64,
     while the Spark parquet side reads int64. Values equal (54 == 54.0),
     hashes differ. (r7 sketch_cms_topk incident.)
  2. ARRAY output column: both .df() sides hold numpy arrays / lists;
     pandas hash_pandas_object raises "unhashable type". (r6 nest_collect
     incident — the reason oracles must serialize arrays with concat_ws.)

Run: python3 tools/test_comparator_contract.py   (exit 0 = contract holds)
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import duckdb  # noqa: E402
from compare_oracle import canon, pandas_mimic  # noqa: E402


def primary_compare(con, spark_path, sql):
    """The fetchall/canon path of compare_oracle.main, minus the mimic."""
    sp = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'")
    sp_cols, sp_rows = [d[0] for d in sp.description], sp.fetchall()
    du = con.sql(sql)
    du_cols, du_rows = [d[0] for d in du.description], du.fetchall()
    if sorted(sp_cols) != sorted(du_cols):
        return "cols"
    if len(sp_rows) != len(du_rows):
        return "rows"
    if canon(sp_rows, sp_cols) != canon(du_rows, du_cols):
        return "values"
    return None


def seed_spark_result(con, root, name, select_sql):
    """Write a fake Spark verify output dir (one parquet) via DuckDB."""
    d = os.path.join(root, name)
    os.makedirs(d)
    con.execute(f"COPY ({select_sql}) TO '{d}/part-0.parquet' (FORMAT PARQUET)")
    return d


def main():
    failures = []
    with tempfile.TemporaryDirectory() as root:
        con = duckdb.connect()

        # -- fixture 1: HUGEINT aggregate ---------------------------------
        # Spark side: plain BIGINT 54. Oracle side: SUM over BIGINTs -> the
        # driver's pandas fetch turns the HUGEINT into float64.
        sp = seed_spark_result(con, root, "seed_hugeint",
                               "SELECT 'a' AS k, CAST(54 AS BIGINT) AS s")
        sql = "SELECT 'a' AS k, SUM(v) AS s FROM (VALUES (CAST(27 AS BIGINT)), (27)) t(v)"
        if primary_compare(con, sp, sql) is not None:
            failures.append("hugeint: primary compare should be blind to dtype drift")
        err = pandas_mimic(con, sp, sql)
        if not err or "dtype" not in err:
            failures.append(f"hugeint: mimic missed the drift (got: {err!r})")
        else:
            print(f"OK  hugeint fixture red-flagged: {err}")

        # -- fixture 2: ARRAY output column -------------------------------
        # Identical list values on both sides; the driver's pandas hash
        # still dies on the unhashable cells.
        sp = seed_spark_result(con, root, "seed_array",
                               "SELECT 1 AS id, [1, 2, 3] AS xs")
        sql = "SELECT 1 AS id, [1, 2, 3] AS xs"
        if primary_compare(con, sp, sql) is not None:
            failures.append("array: primary compare should be blind to array cells")
        err = pandas_mimic(con, sp, sql)
        if not err or "unhashable" not in err:
            failures.append(f"array: mimic missed the array column (got: {err!r})")
        else:
            print(f"OK  array fixture red-flagged: {err}")

        # -- control: a clean result must pass both paths -----------------
        sp = seed_spark_result(con, root, "seed_clean",
                               "SELECT 'a' AS k, CAST(54 AS BIGINT) AS s")
        sql = "SELECT 'a' AS k, CAST(SUM(v) AS BIGINT) AS s FROM (VALUES (CAST(27 AS BIGINT)), (27)) t(v)"
        if primary_compare(con, sp, sql) is not None:
            failures.append("control: primary compare failed a clean fixture")
        err = pandas_mimic(con, sp, sql)
        if err is not None:
            failures.append(f"control: mimic false-positived a clean fixture: {err}")
        else:
            print("OK  clean control passes both paths")

    if failures:
        for f in failures:
            print(f"FAIL {f}")
        return 1
    print("== comparator contract holds ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
