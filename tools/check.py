#!/usr/bin/env python3
"""Dev-only oracle checker mimicking the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Registers each fixture parquet as a DuckDB view named after the table, runs
every oracle SQL from <verifyOutDir>/oracle_sql.json, reads the Spark result
parquet from <verifyOutDir>/<name>/, and compares: column names (sorted),
row count, and cell values (rows sorted). NOT shipped library code.
"""
import os, sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


import re

# Driver-hash type classes: the driver's compare hashes pandas frames, so
# any oracle column whose DuckDB type maps to a different pandas dtype than
# the Spark parquet's (HUGEINT/DECIMAL -> object/float128-ish vs BIGINT ->
# int64) hash-mismatches even when every value is equal (the
# image_radius_sweep r14 escape). Int widths <= 64 bits all land in int64,
# so those are collapsed; HUGEINT/UBIGINT/DECIMAL deliberately are NOT.
def norm_type(t):
    # Only int widths <= 64 bits collapse (all land in pandas int64, so
    # the driver hash cannot tell them apart). Timestamp tz/precision
    # variants deliberately do NOT collapse: datetime64[ns, UTC] vs
    # datetime64[us] ARE different pandas dtypes, i.e. exactly the
    # hash-sensitive class this check exists to catch.
    t = t.upper()
    t = re.sub(r"\b(TINYINT|SMALLINT|INTEGER|UTINYINT|USMALLINT|UINTEGER)\b",
               "BIGINT", t)
    return t


def type_mismatches(con, sql, files):
    """Compare DESCRIBE(oracle sql) vs DESCRIBE(spark parquet) per column.

    Returns a list of 'col: spark_type != oracle_type' strings (normalized
    types shown raw for readability)."""
    want = {r[0].lower(): r[1] for r in
            con.execute(f"DESCRIBE {sql}").fetchall()}
    got = {r[0].lower(): r[1] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()}
    bad = []
    for c in sorted(set(want) & set(got)):
        if norm_type(want[c]) != norm_type(got[c]):
            bad.append(f"{c}: spark {got[c]} != oracle {want[c]}")
    return bad


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; generated ones (GenFixtures
        # sf1) are Spark-style directories — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        wcols, gcols = sorted(want.columns), sorted(got.columns)
        if [c.lower() for c in wcols] != [c.lower() for c in gcols]:
            print(f"FAIL {name}: columns {gcols} != oracle {wcols}")
            n_fail += 1
            continue
        tbad = type_mismatches(con, sql, files)
        if tbad:
            print(f"FAIL {name}: column TYPE mismatch (driver hash is "
                  f"type-sensitive): {'; '.join(tbad)}")
            n_fail += 1
            continue
        w = want[wcols].values.tolist()
        g = got[gcols].values.tolist()
        w = sorted([tuple(norm(x) for x in r) for r in w], key=repr)
        g = sorted([tuple(norm(x) for x in r) for r in g], key=repr)
        if len(w) != len(g):
            print(f"FAIL {name}: rows {len(g)} != oracle {len(w)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(g, w) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(w)} cells differ; first: got={bad[0][0]} want={bad[0][1]}")
            n_fail += 1
        else:
            print(f"ok   {name} ({len(w)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
