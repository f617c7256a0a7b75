#!/usr/bin/env python3
"""Index-statistics head-to-head equality check.

The reference `stats` prints its summary numbers and (with --histogram)
rank-depth histograms; graft `stats` writes per-taxon minimizer counts as
TSV. This script re-derives every reference number INDEPENDENTLY from
graft's output plus nodes.dmp (reference semantics reimplemented here:
rank-ladder depth with root forced to depth 0, leaf = no children in the
whole taxonomy, tree size = stored taxa plus all ancestors) and requires
exact equality.

Usage: compare_indexstats.py ref_stats.log ref_histogram.log graft_tsv_dir nodes.dmp
"""
import glob
import os
import re
import sys

LADDER = {"root": 0, "superkingdom": 1, "kingdom": 2, "phylum": 3,
          "class": 4, "order": 5, "family": 6, "genus": 7, "species": 8}


def parse_nodes(path):
    parent, rank, children = {}, {}, {}
    with open(path) as f:
        for line in f:
            p = [x.strip() for x in line.split("|")]
            if len(p) < 3:
                continue
            t, par, rk = int(p[0]), int(p[1]), p[2]
            parent[t] = par
            rank[t] = rk
            if t != par:
                children.setdefault(par, set()).add(t)
    return parent, rank, children


def rank_depth(t, parent, rank):
    # reference Taxonomy.depth: ladder index of the first ranked
    # self-or-ancestor; ranks(ROOT) is forced to Root (depth 0)
    seen = 0
    while True:
        if t == 1:
            return 0
        if rank.get(t) in LADDER:
            return LADDER[rank[t]]
        t = parent.get(t, 1)
        seen += 1
        if seen > 10000:
            return -1


def parse_show_table(lines, title):
    """Parse the show() table that follows `title` in the log: returns
    {depth: count} from rows like `|    0| root|  123|`."""
    out = {}
    it = iter(lines)
    for line in it:
        if title in line:
            break
    else:
        raise SystemExit(f"[indexstats] FAIL: '{title}' not found in ref log")
    for line in it:
        s = line.strip()
        if s.startswith("+"):
            continue
        if not s.startswith("|"):
            if out:
                break
            continue
        cells = [c.strip() for c in s.strip("|").split("|")]
        if cells[0] in ("depth", ""):
            continue
        out[int(cells[0])] = int(cells[-1])
    return out


def main():
    ref_log, ref_hist_log, graft_dir, nodes_dmp = sys.argv[1:5]
    parent, rank, children = parse_nodes(nodes_dmp)

    ref_text = open(ref_log).read()
    m1 = re.search(r"Tree size: (\d+) taxa, stored taxa: (\d+), of which "
                   r"(\d+)\s+leaf taxa", ref_text)
    m2 = re.search(r"Total \d+-minimizers: (\d+), of which leaf records: "
                   r"(\d+)", ref_text)
    if not m1 or not m2:
        raise SystemExit("[indexstats] FAIL: reference summary lines not found")
    ref = dict(tree_size=int(m1.group(1)), stored=int(m1.group(2)),
               leaf_taxa=int(m1.group(3)), total=int(m2.group(1)),
               leaf_records=int(m2.group(2)))

    counts = {}
    for f in sorted(set(glob.glob(os.path.join(graft_dir, "*.csv"))) |
             set(glob.glob(os.path.join(graft_dir, "part-*")))):
        for line in open(f):
            line = line.strip()
            if not line:
                continue
            t, n = line.split("\t")
            counts[int(t)] = counts.get(int(t), 0) + int(n)
    if not counts:
        raise SystemExit(f"[indexstats] FAIL: no graft TSV rows in {graft_dir}")

    is_leaf = lambda t: not children.get(t)
    closure = set()
    for t in counts:
        while t not in closure and t in parent:
            closure.add(t)
            if t == 1:
                break
            t = parent[t]
    graft = dict(
        tree_size=len(closure),
        stored=len(counts),
        leaf_taxa=sum(1 for t in counts if is_leaf(t)),
        total=sum(counts.values()),
        leaf_records=sum(n for t, n in counts.items() if is_leaf(t)))

    failures = [k for k in ref if ref[k] != graft[k]]

    hist_lines = open(ref_hist_log).read().splitlines()
    ref_min_hist = parse_show_table(hist_lines, "Minimizer depth histogram")
    ref_tax_hist = parse_show_table(hist_lines, "Taxon depth histogram")
    g_min_hist, g_tax_hist = {}, {}
    for t, n in counts.items():
        d = rank_depth(t, parent, rank)
        g_min_hist[d] = g_min_hist.get(d, 0) + n
        g_tax_hist[d] = g_tax_hist.get(d, 0) + 1
    if ref_min_hist != g_min_hist:
        failures.append(f"min_depth_histogram ref={ref_min_hist} graft={g_min_hist}")
    if ref_tax_hist != g_tax_hist:
        failures.append(f"taxon_depth_histogram ref={ref_tax_hist} graft={g_tax_hist}")

    if failures:
        print(f"[indexstats] FAIL: {failures}")
        print(f"  ref:   {ref}")
        print(f"  graft: {graft}")
        sys.exit(1)
    print(f"[indexstats] OK: summary identical ({graft['stored']} stored taxa, "
          f"{graft['total']} minimizers, tree size {graft['tree_size']}); "
          f"depth histograms identical ({len(ref_min_hist)} depth bins)")


if __name__ == "__main__":
    main()
