#!/usr/bin/env python3
"""Round-close alarm: CORRECTNESS_r{N}.json keys must equal the declared
inventory (VERDICT r9 ask #7 — in r9 three queries threw at runtime and
were silently ABSENT from the driver artifact, so 110 keys parsed as "all
green" against 113 declared).

The declared inventory is read from a Verify output dir's oracle_sql.json
plus the known no-oracle keys (which appear in CORRECTNESS with
err="no_oracle" but not in oracle_sql.json).

Usage: check_round_close.py <CORRECTNESS_rN.json> <verifyOutDir>
Exit 1 (and print the diff) on any mismatch or any non-pass row.
"""
import sys, json, os

NO_ORACLE = {"agg_sketch", "similarity_ivf"}  # declared rows-only keys

def main():
    corr_path, vdir = sys.argv[1], sys.argv[2]
    corr = json.load(open(corr_path))
    declared = set(json.load(open(os.path.join(vdir, "oracle_sql.json")))) | NO_ORACLE
    got = set(corr)
    missing = sorted(declared - got)
    extra = sorted(got - declared)
    bad = sorted(k for k, v in corr.items()
                 if v.get("err") not in (None, "no_oracle")
                 or (v.get("err") is None and not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))))
    ok = not (missing or extra or bad)
    print(f"declared={len(declared)} present={len(got)} "
          f"missing={missing} extra={extra} failing={bad}")
    print("ROUND-CLOSE OK" if ok else "ROUND-CLOSE ALARM")
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
