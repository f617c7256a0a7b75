#!/usr/bin/env python3
"""Independent golden derivation for g03_classify at sf0.01.

Completes the independently verified chain (golden_g01: scanner,
golden_g02: index build) with classification: per-order reads are cut from
the customer genomes, every k-mer's minimizer is looked up in the
independently built LCA record map, and the Kraken 2 resolver (leaf-to-root
path scoring, LCA fold over tied maxima) is re-implemented from scratch.
g03 runs with confidence=0 and minHitGroups=1, so no lift loop applies.
Run once; commit the output.
"""
import pyarrow.parquet as pq
from golden_g01 import dna_of, encode, priority, K, M


def main(sf="/root/testdata/sf0.01", tag="sf001"):
    nation = pq.read_table(f"{sf}/nation.parquet")
    region = pq.read_table(f"{sf}/region.parquet")
    customer = pq.read_table(f"{sf}/customer.parquet")
    orders = pq.read_table(f"{sf}/orders.parquet")

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
        if b == 0:
            return a
        while depth(a) > depth(b):
            a = parents[a]
        while depth(b) > depth(a):
            b = parents[b]
        while a != b:
            a, b = parents[a], parents[b]
        return a

    # index: minimizer -> LCA taxon (as in golden_g02) + per-customer dna
    records = {}
    cust_dna = {}
    cust_nat = {}
    for key, name, nat in zip(customer.column("c_custkey").to_pylist(),
                              customer.column("c_name").to_pylist(),
                              customer.column("c_nationkey").to_pylist()):
        dna = dna_of(name)
        cust_dna[key] = dna
        cust_nat[key] = nat
        taxon = 10 + nat
        n = len(dna)
        pris = [priority(encode(dna[j:j + M])) for j in range(n - M + 1)]
        for mnz in {min(pris[i:i + K - M + 1]) for i in range(n - K + 1)}:
            records[mnz] = lca(records.get(mnz, 0), taxon)

    def classify(read):
        n = len(read)
        pris = [priority(encode(read[j:j + M])) for j in range(n - M + 1)]
        counts = {}
        for i in range(n - K + 1):
            t = records.get(min(pris[i:i + K - M + 1]), 0)
            if t > 0:
                counts[t] = counts.get(t, 0) + 1
        if not counts:
            return 0
        # Kraken 2 resolve: score = root-path sum; ties fold with LCA
        def path_score(t):
            s = 0
            while t != 0:
                s += counts.get(t, 0)
                t = parents[t]
            return s
        best, best_score = 0, 0
        for t in counts:
            s = path_score(t)
            if s > best_score:
                best, best_score = t, s
            elif s == best_score and s > 0:
                best = lca(best, t)
        return best

    out = {}
    for okey, ckey in zip(orders.column("o_orderkey").to_pylist(),
                          orders.column("o_custkey").to_pylist()):
        dna = cust_dna[ckey]
        pos = (okey % 80) + 1  # SQL substring is 1-based
        read = dna[pos - 1:pos - 1 + 44]
        t = classify(read)
        out[t] = out.get(t, 0) + 1

    with open(f"src/test/resources/golden/g03_classify_{tag}.tsv", "w") as f:
        for t in sorted(out):
            f.write(f"{t}\t{out[t]}\n")
    print("taxa:", len(out), "reads:", sum(out.values()))


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:])
