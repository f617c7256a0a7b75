#!/usr/bin/env python3
"""Independent golden derivation for g15_index_migration.

Re-derives BOTH index folds with the from-scratch kernel in golden_g01
and an independently implemented LCA — subject = the plain nation-labeled
library; reference = the same library plus every 7th genome relabeled to
the next nation (so those minimizers' reference LCAs fold up to the
shared region or to root) — then the reference-semantics migration
histogram: for every subject minimizer, steps = rank_depth(subject LCA) -
rank_depth(reference LCA), where rank depth follows the reference's
ladder (nation rank "species" = 8, region rank "kingdom" = 2, root = 0 —
non-ladder ranks inherit the nearest ranked ancestor). Run once per SF;
commit the output.
"""
import pyarrow.parquet as pq
from golden_g01 import dna_of
from golden_g02 import minimizers


def main(sf="/root/testdata/sf0.01", tag="sf001"):
    nation = pq.read_table(f"{sf}/nation.parquet")
    region = pq.read_table(f"{sf}/region.parquet")
    customer = pq.read_table(f"{sf}/customer.parquet")

    parents = {1: 0}
    for r in region.column("r_regionkey").to_pylist():
        parents[2 + r] = 1
    for n, r in zip(nation.column("n_nationkey").to_pylist(),
                    nation.column("n_regionkey").to_pylist()):
        parents[10 + n] = 2 + r

    def depth(t):
        d = 0
        while parents[t] != 0:
            t = parents[t]
            d += 1
        return d

    def lca(a, b):
        if a == 0:
            return b
        while depth(a) > depth(b):
            a = parents[a]
        while depth(b) > depth(a):
            b = parents[b]
        while a != b:
            a, b = parents[a], parents[b]
        return a

    # reference rank-ladder depth on the star taxonomy: nations carry rank
    # "species" (ladder 8), regions "kingdom" (ladder 2), root 0
    def rank_depth(t):
        if t >= 10:
            return 8
        if t >= 2:
            return 2
        return 0

    def fold(rows):
        records = {}
        for name, nat in rows:
            taxon = 10 + nat
            for m in minimizers(dna_of(name)):
                records[m] = lca(records.get(m, 0), taxon)
        return records

    names = customer.column("c_name").to_pylist()
    nats = customer.column("c_nationkey").to_pylist()
    keys = customer.column("c_custkey").to_pylist()
    subject = fold(zip(names, nats))
    reference = fold(
        list(zip(names, nats)) +
        [(nm, (nt + 1) % 25) for nm, nt, ck in zip(names, nats, keys)
         if ck % 7 == 0])

    hist = {}
    for m, t_subj in subject.items():
        steps = rank_depth(t_subj) - rank_depth(reference[m])
        hist[steps] = hist.get(steps, 0) + 1

    with open(f"src/test/resources/golden/g15_migration_{tag}.tsv", "w") as f:
        for s in sorted(hist):
            f.write(f"{s}\t{hist[s]}\n")
    print(f"{tag}: matched {len(subject)} minimizers, hist {sorted(hist.items())}")


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:])
