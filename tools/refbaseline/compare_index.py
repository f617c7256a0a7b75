#!/usr/bin/env python3
"""Compare two on-disk minimizer-LCA indexes (reference vs graft) by CONTENT.

Usage: compare_index.py ref_index_dir graft_index_dir

Both engines store the index as bucketed parquet with key columns id1
[, id2, ...] and a taxon column; bucket file layout differs, so the
comparison is over the full multiset of (key..., taxon) rows, via DuckDB.

Representation note: the reference left-aligns the 2m minimizer bits in
the 64-bit word (low bits zero); graft right-aligns. An optional third
argument gives the left-shift (in bits) to apply to graft's single-word
keys before comparing — 64 - 2m mod 64 (e.g. 2 for m=31). Only supported
for one-word keys.

Exits 0 iff the multisets are identical (after alignment).
"""
import sys

import duckdb


def key_cols(con, path):
    cols = [r[0] for r in con.execute(
        f"SELECT column_name FROM (DESCRIBE SELECT * FROM parquet_scan('{path}/*.parquet'))"
    ).fetchall()]
    ids = sorted(c for c in cols if c.startswith("id"))
    assert "taxon" in cols, f"no taxon column in {path}: {cols}"
    return ids


def shifted(col, shift):
    if shift == 0:
        return col
    # wrap-around left shift on int64 via HUGEINT arithmetic
    return (f"CAST((CAST({col} AS HUGEINT) * {1 << shift}) "
            f"% 18446744073709551616 "
            f"- CASE WHEN (CAST({col} AS HUGEINT) * {1 << shift}) "
            f"% 18446744073709551616 >= 9223372036854775808 "
            f"THEN 18446744073709551616 ELSE 0 END AS BIGINT)")


def digest(con, path, ids, shift=0):
    cols = ", ".join([shifted(c, shift) for c in ids] + ["taxon"])
    n, h = con.execute(
        f"""SELECT count(*),
                   bit_xor(hash(({cols})))
            FROM parquet_scan('{path}/*.parquet')""").fetchone()
    return n, h


def main():
    ref, graft = sys.argv[1:3]
    shift = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    con = duckdb.connect()
    ids_r, ids_g = key_cols(con, ref), key_cols(con, graft)
    if ids_r != ids_g:
        print(f"index: MISMATCH (key columns differ: {ids_r} vs {ids_g})")
        sys.exit(1)
    if shift and len(ids_g) > 1:
        print("index: shift only supported for one-word keys")
        sys.exit(1)
    nr, hr = digest(con, ref, ids_r)
    ng, hg = digest(con, graft, ids_g, shift)
    note = f", graft keys <<{shift} (alignment)" if shift else ""
    if (nr, hr) == (ng, hg):
        print(f"index: MATCH ({nr} records, keys {ids_r}{note})")
        sys.exit(0)
    print(f"index: MISMATCH (ref {nr} records hash {hr}, graft {ng} hash {hg})")
    rcols = ", ".join(ids_r + ["taxon"])
    gcols = ", ".join([shifted(c, shift) + f" AS {c}" for c in ids_g]
                      + ["taxon"])
    for row in con.execute(
            f"""(SELECT 'ref-only' side, * FROM
                  (SELECT {rcols} FROM parquet_scan('{ref}/*.parquet')
                   EXCEPT ALL
                   SELECT {gcols} FROM parquet_scan('{graft}/*.parquet')))
                UNION ALL
                (SELECT 'graft-only', * FROM
                  (SELECT {gcols} FROM parquet_scan('{graft}/*.parquet')
                   EXCEPT ALL
                   SELECT {rcols} FROM parquet_scan('{ref}/*.parquet')))
                LIMIT 10""").fetchall():
        print(" ", row)
    sys.exit(1)


if __name__ == "__main__":
    main()
