#!/usr/bin/env python3
"""Independent golden derivation for g02_lca_index at sf0.01.

Builds the star taxonomy (root <- regions <- nations), derives each
customer's genome with the md5 chain, extracts every chosen minimizer with
the from-scratch kernel in golden_g01, folds each minimizer's contributing
taxa with an independently implemented LCA, and counts records per taxon —
i.e. the ENTIRE index build path re-done without any shared code. Run once;
commit the output.
"""
import pyarrow.parquet as pq
from golden_g01 import dna_of, encode, priority, K, M


def minimizers(dna):
    n = len(dna)
    pris = [priority(encode(dna[j:j + M])) for j in range(n - M + 1)]
    return {min(pris[i:i + K - M + 1]) for i in range(n - K + 1)}


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

    records = {}
    for name, nat in zip(customer.column("c_name").to_pylist(),
                         customer.column("c_nationkey").to_pylist()):
        taxon = 10 + nat
        for m in minimizers(dna_of(name)):
            records[m] = lca(records.get(m, 0), taxon)

    counts = {}
    for t in records.values():
        counts[t] = counts.get(t, 0) + 1
    with open(f"src/test/resources/golden/g02_lca_{tag}.tsv", "w") as f:
        for t in sorted(counts):
            f.write(f"{t}\t{counts[t]}\n")
    print("taxa:", len(counts), "records:", len(records))


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:])
