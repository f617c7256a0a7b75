#!/usr/bin/env python3
"""Compare two on-disk minimizer-LCA indexes (reference vs graft) by CONTENT.

Usage: compare_index.py ref_index_dir graft_index_dir

Both engines store the index as bucketed parquet with key columns id1
[, id2, ...] and a taxon column; bucket file layout differs, so the
comparison is over the full multiset of (key..., taxon) rows, via DuckDB.
Exits 0 iff the multisets are identical.
"""
import sys

import duckdb


def key_cols(con, path):
    cols = [r[0] for r in con.execute(
        f"SELECT name FROM (DESCRIBE SELECT * FROM parquet_scan('{path}/*.parquet'))"
    ).fetchall()]
    ids = sorted(c for c in cols if c.startswith("id"))
    assert "taxon" in cols, f"no taxon column in {path}: {cols}"
    return ids


def digest(con, path, ids):
    cols = ", ".join(ids + ["taxon"])
    n, h = con.execute(
        f"""SELECT count(*),
                   bit_xor(hash(({cols})))
            FROM parquet_scan('{path}/*.parquet')""").fetchone()
    return n, h


def main():
    ref, graft = sys.argv[1:3]
    con = duckdb.connect()
    ids_r, ids_g = key_cols(con, ref), key_cols(con, graft)
    if ids_r != ids_g:
        print(f"index: MISMATCH (key columns differ: {ids_r} vs {ids_g})")
        sys.exit(1)
    nr, hr = digest(con, ref, ids_r)
    ng, hg = digest(con, graft, ids_g)
    if (nr, hr) == (ng, hg):
        print(f"index: MATCH ({nr} records, keys {ids_r}, multiset hash ok)")
        sys.exit(0)
    print(f"index: MISMATCH (ref {nr} records hash {hr}, graft {ng} hash {hg})")
    cols = ", ".join(ids_r + ["taxon"])
    for row in con.execute(
            f"""(SELECT 'ref-only' side, * FROM
                  (SELECT {cols} FROM parquet_scan('{ref}/*.parquet')
                   EXCEPT ALL
                   SELECT {cols} FROM parquet_scan('{graft}/*.parquet')))
                UNION ALL
                (SELECT 'graft-only', * FROM
                  (SELECT {cols} FROM parquet_scan('{graft}/*.parquet')
                   EXCEPT ALL
                   SELECT {cols} FROM parquet_scan('{ref}/*.parquet')))
                LIMIT 10""").fetchall():
        print(" ", row)
    sys.exit(1)


if __name__ == "__main__":
    main()
