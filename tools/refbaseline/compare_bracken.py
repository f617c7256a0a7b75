#!/usr/bin/env python3
"""Compare reference vs graft bracken weights for the head-to-head.

Usage: compare_bracken.py ref_kmer_distrib graft_csv_dir

- reference: one file, header line, then `dest \t src:count:totalReads ...`
  (count = reads from src classified to dest; totalReads = all reads of src)
- graft: CSV part files of `dest \t src:reads:frac ...` (frac = reads /
  source total, rounded to 6 dp)

Normalized comparison: the multiset of (dest, source, read-count) triples
must be identical — per-source totals and fractions are derived from it on
both sides. graft's printed fractions are additionally checked against its
own counts. Exits 0 iff everything matches.
"""
import glob
import os
import sys


def parse_ref(path):
    triples = {}
    with open(path) as fh:
        next(fh)  # header
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2 or not parts[1]:
                continue
            dest = int(parts[0])
            for item in parts[1].split(" "):
                src, count, _total = item.split(":")
                triples[(dest, int(src))] = int(count)
    return triples


def parse_graft(out_dir):
    triples, frac_bad = {}, 0
    files = [f for f in glob.glob(os.path.join(out_dir, "*"))
             if not f.endswith(("_SUCCESS", ".crc")) and os.path.isfile(f)]
    for f in sorted(files):
        with open(f) as fh:
            for line in fh:
                parts = line.rstrip("\n").split("\t")
                if len(parts) < 2 or not parts[1]:
                    continue
                dest = int(parts[0])
                for item in parts[1].split(" "):
                    src, reads, frac = item.split(":")
                    triples[(dest, int(src))] = int(reads)
    # self-consistency: printed frac == reads / source-total (6 dp)
    totals = {}
    for (dest, src), n in triples.items():
        totals[src] = totals.get(src, 0) + n
    for f in sorted(files):
        with open(f) as fh:
            for line in fh:
                parts = line.rstrip("\n").split("\t")
                if len(parts) < 2 or not parts[1]:
                    continue
                for item in parts[1].split(" "):
                    src, reads, frac = item.split(":")
                    want = round(int(reads) / totals[int(src)], 6)
                    if abs(float(frac) - want) > 5e-7:
                        frac_bad += 1
    return triples, frac_bad


def main():
    ref_file, graft_dir = sys.argv[1:3]
    ref = parse_ref(ref_file)
    graft, frac_bad = parse_graft(graft_dir)
    ok = True
    if ref == graft:
        print(f"weights: MATCH ({len(ref)} (dest, source) pairs, "
              f"{sum(ref.values())} reads)")
    else:
        ok = False
        both = set(ref) & set(graft)
        diff = [k for k in both if ref[k] != graft[k]]
        print(f"weights: MISMATCH (ref {len(ref)} pairs, graft {len(graft)}; "
              f"{len(diff)} differing counts)")
        for k in sorted(set(ref) - set(graft))[:5]:
            print(f"  ref-only:   {k} -> {ref[k]}")
        for k in sorted(set(graft) - set(ref))[:5]:
            print(f"  graft-only: {k} -> {graft[k]}")
        for k in sorted(diff)[:5]:
            print(f"  count diff: {k} ref={ref[k]} graft={graft[k]}")
    if frac_bad:
        ok = False
        print(f"graft fractions: {frac_bad} inconsistent with counts")
    else:
        print("graft fractions: consistent with counts")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
