#!/usr/bin/env python3
"""compareIndex (MinimizerMigration) head-to-head equality check.

The reference prints its rank-step histogram via show() and writes a
_taxaToRoot_report.txt kreport; graft writes the histogram as a _migration
TSV directory and the same kreport file. Both histograms and both kreports
must match exactly.

Usage: compare_migration.py ref_cmpidx.log ref_taxaToRoot.txt \
         graft_migration_dir graft_taxaToRoot.txt
"""
import glob
import os
import sys


def parse_ref_histogram(path):
    """Parse the reference's show()-printed steps histogram.

    CAVEAT (ADVICE r17): show() truncates at 20 rows by default, so a
    migration with >20 distinct step values yields a spurious (loud, not
    silent) FAIL against graft's complete TSV. The raced index pair tops
    out well under 20 bins; re-capture the reference histogram through a
    non-truncating sink before racing a pair that could exceed that.
    """
    out = {}
    in_table = False
    for line in open(path):
        s = line.strip()
        if s.startswith("|steps|"):
            in_table = True
            continue
        if not in_table:
            continue
        if s.startswith("+"):
            continue
        if not s.startswith("|"):
            break
        cells = [c.strip() for c in s.strip("|").split("|")]
        out[int(cells[0])] = int(cells[1])
    if not out:
        raise SystemExit(f"[migration] FAIL: no steps histogram in {path}")
    return out


def parse_graft_histogram(d):
    out = {}
    for f in sorted(set(glob.glob(os.path.join(d, "*.csv"))) |
             set(glob.glob(os.path.join(d, "part-*")))):
        for line in open(f):
            line = line.strip()
            if not line:
                continue
            steps, n = line.split("\t")
            out[int(steps)] = out.get(int(steps), 0) + int(n)
    if not out:
        raise SystemExit(f"[migration] FAIL: no graft histogram rows in {d}")
    return out


def kreport_lines(path):
    """Field-wise normalization: split on tabs, strip each field, parse the
    percent column numerically (the reference pads with %6.2f, graft with
    %.2f — same value, different width)."""
    out = []
    for l in open(path).read().splitlines():
        if not l.strip():
            continue
        fields = [f.strip() for f in l.split("\t")]
        if fields and not fields[0].startswith("#"):
            try:
                fields[0] = f"{float(fields[0]):.2f}"
            except ValueError:
                pass
        out.append(tuple(fields))
    return out


def main():
    ref_log, ref_report, graft_dir, graft_report = sys.argv[1:5]
    ref_hist = parse_ref_histogram(ref_log)
    graft_hist = parse_graft_histogram(graft_dir)
    ok = True
    if ref_hist != graft_hist:
        print(f"[migration] FAIL: histograms differ\n  ref:   {ref_hist}\n"
              f"  graft: {graft_hist}")
        ok = False
    a, b = kreport_lines(ref_report), kreport_lines(graft_report)
    if a != b:
        print(f"[migration] FAIL: taxaToRoot kreports differ "
              f"({len(a)} vs {len(b)} lines)")
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print(f"  line {i}: ref={x!r} graft={y!r}")
                break
        ok = False
    if not ok:
        sys.exit(1)
    matched = sum(ref_hist.values())
    print(f"[migration] OK: step histograms identical "
          f"({matched} matched minimizers over {len(ref_hist)} bins: "
          f"{sorted(ref_hist.items())}); taxaToRoot kreports identical "
          f"({len(a)} lines)")


if __name__ == "__main__":
    main()
