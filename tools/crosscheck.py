#!/usr/bin/env python3
"""Dev-only cross-setting dump comparator (gate.sh step 2).

Usage: python3 tools/crosscheck.py <dumpDirA> <dumpDirB> [query ...]

Compares the Verify dumps produced at two shuffle-partition settings
query-by-query, cell-by-cell, IN DUMP ORDER (no sorting): Verify
canonicalizes each dump to a single sorted partition, so any ordering or
value difference between the two settings is a real partition-count
sensitivity — the family the driver's environment exposes even when both
dumps happen to agree with the local oracle. NOT shipped library code.
"""
import sys, glob, math, os
import duckdb


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    names = sorted(d for d in os.listdir(a_dir)
                   if os.path.isdir(os.path.join(a_dir, d)))
    if only:
        names = [n for n in names if n in only]
    con = duckdb.connect()
    n_ok = n_fail = 0
    for name in names:
        fa = sorted(glob.glob(f"{a_dir}/{name}/*.parquet"))
        fb = sorted(glob.glob(f"{b_dir}/{name}/*.parquet"))
        if not fa or not fb:
            print(f"FAIL {name}: missing dump (a={len(fa)} b={len(fb)} files)")
            n_fail += 1
            continue
        da = con.execute(f"SELECT * FROM read_parquet({fa!r})").fetchdf()
        db = con.execute(f"SELECT * FROM read_parquet({fb!r})").fetchdf()
        if list(da.columns) != list(db.columns):
            print(f"FAIL {name}: columns {list(da.columns)} != {list(db.columns)}")
            n_fail += 1
            continue
        ra = [tuple(norm(x) for x in r) for r in da.values.tolist()]
        rb = [tuple(norm(x) for x in r) for r in db.values.tolist()]
        if len(ra) != len(rb):
            print(f"FAIL {name}: rows {len(ra)} != {len(rb)}")
            n_fail += 1
            continue
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(ra, rb)) if x != y]
        if bad:
            i, x, y = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(ra)} rows differ across "
                  f"settings; first at row {i}: a={x} b={y}")
            n_fail += 1
        else:
            n_ok += 1
    print(f"== crosscheck: {n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
