#!/usr/bin/env python3
"""Compare reference vs graft classify2 outputs for the head-to-head.

Usage: compare_classify2.py nodes.dmp ref_out_dir ref_taxonset graft_out_dir
       graft_taxonset

- per-read decisions: both engines write kraken-style per-read lines
  (status \t title \t taxon \t ...) gzipped under <out>/sample=all/.
  Compared as the full multiset of (status, title, taxon).
- taxon sets: BOTH engines write the PRE-expansion selection to
  _taxonSet.txt (graft matched the reference's file semantics in r16; its
  expanded set moved to _taxonSetExpanded.txt). Compared raw, and also
  after expanding both with descendants from nodes.dmp (the comparison
  that matters for classification equivalence).

Exits 0 iff both comparisons match.
"""
import glob
import gzip
import os
import sys


def read_decisions(out_dir):
    rows = []
    pattern = os.path.join(out_dir, "sample=*", "*")
    for f in sorted(glob.glob(pattern)):
        if f.endswith(("_SUCCESS", ".crc")) or os.path.isdir(f):
            continue
        opener = gzip.open if f.endswith(".gz") else open
        with opener(f, "rt") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                parts = line.split("\t")
                rows.append((parts[0], parts[1], parts[2]))
    return sorted(rows)


def read_taxon_set(path):
    with open(path) as fh:
        return {int(l) for l in fh if l.strip()}


def children_map(nodes_dmp):
    kids = {}
    with open(nodes_dmp) as fh:
        for line in fh:
            parts = [p.strip() for p in line.split("|")]
            tax, parent = int(parts[0].strip("\t ")), int(parts[1].strip("\t "))
            if tax != parent:
                kids.setdefault(parent, set()).add(tax)
    return kids


def with_descendants(taxa, kids):
    out, stack = set(taxa), list(taxa)
    while stack:
        t = stack.pop()
        for c in kids.get(t, ()):
            if c not in out:
                out.add(c)
                stack.append(c)
    return out


def main():
    nodes, ref_dir, ref_set_f, graft_dir, graft_set_f = sys.argv[1:6]
    ok = True

    ref = read_decisions(ref_dir)
    graft = read_decisions(graft_dir)
    n_match = sum(1 for a, b in zip(ref, graft) if a == b)
    if ref == graft:
        c = sum(1 for r in ref if r[0] == "C")
        print(f"per-read: MATCH ({len(ref)} reads, {c} classified)")
    else:
        ok = False
        print(f"per-read: MISMATCH (ref {len(ref)} rows, graft {len(graft)} "
              f"rows, {n_match} positional matches)")
        ref_only = set(ref) - set(graft)
        graft_only = set(graft) - set(ref)
        for r in sorted(ref_only)[:5]:
            print(f"  ref-only:   {r}")
        for r in sorted(graft_only)[:5]:
            print(f"  graft-only: {r}")

    kids = children_map(nodes)
    ref_raw = read_taxon_set(ref_set_f)
    graft_raw = read_taxon_set(graft_set_f)
    if ref_raw == graft_raw:
        print(f"taxon set (pre-expansion): MATCH ({sorted(graft_raw)})")
    else:
        ok = False
        print(f"taxon set (pre-expansion): MISMATCH ref={sorted(ref_raw)} "
              f"graft={sorted(graft_raw)}")
    ref_taxa = with_descendants(ref_raw, kids)
    graft_taxa = with_descendants(graft_raw, kids)
    if ref_taxa == graft_taxa:
        print(f"taxon set (expanded): MATCH ({sorted(graft_taxa)})")
    else:
        ok = False
        print(f"taxon set (expanded): MISMATCH ref+desc={sorted(ref_taxa)} "
              f"graft+desc={sorted(graft_taxa)}")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
