#!/usr/bin/env python3
"""Independent golden derivation for g09_freq_classify at sf0.01.

g09 is g03 with a sampled frequency ordering (fraction=1.0, topN=65536):
the most frequent canonical m-mers of the customer-genome library are
demoted (priority | 1<<63, compared UNSIGNED), changing which m-mers become
minimizers — and therefore the index keys. topN=65536 makes the stored
index genuinely carry DEMOTE-flagged keys (~2.2k of 47k records), so a
classify-time ordering desync (the real failure mode: demotion applied at
build but not at classify) unclassifies hundreds of reads and breaks this
golden; smaller sets never win a window and discriminate nothing. This
reimplements the demotion-set derivation (per-position canonical m-mer
counts, count-desc/mer-asc top-N) and the demoted priority from scratch on
top of golden_g01's kernel, then rebuilds the index and re-classifies like
golden_g03. Run once; commit the output.
"""
import pyarrow.parquet as pq
from collections import Counter
from golden_g01 import dna_of, encode, priority, rc, K, M

TOP_N = 65536
DEMOTE = 1 << 63
MASK = (1 << (2 * M)) - 1
CODE = {"A": 0, "C": 1, "G": 2, "T": 3}


def canonical(mer):
    r = rc(mer, M)
    return mer if mer <= r else r


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

    cust_dna = {}
    cust_tax = {}
    for key, name, nat in zip(customer.column("c_custkey").to_pylist(),
                              customer.column("c_name").to_pylist(),
                              customer.column("c_nationkey").to_pylist()):
        cust_dna[key] = dna_of(name)
        cust_tax[key] = 10 + nat

    # demotion set: every canonical m-mer position of every genome counted,
    # top-512 by (count desc, mer asc) — FrequencyOrdering.topCanonicalMers
    cnt = Counter()
    for dna in cust_dna.values():
        mer = 0
        for i, ch in enumerate(dna):
            mer = ((mer << 2) | CODE[ch]) & MASK
            if i >= M - 1:
                cnt[canonical(mer)] += 1
    demoted = set(m for m, _ in
                  sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_N])

    # demoted priority: FrequencyPriority wraps the spaced/XOR priority; the
    # flag bit compares UNSIGNED (Python ints stay non-negative, so plain
    # comparison matches compareUnsigned)
    def prif(sub):
        mer = encode(sub)
        p = priority(mer)
        return p | DEMOTE if canonical(mer) in demoted else p

    # index build: per-genome distinct window minima -> LCA fold
    records = {}
    for key, dna in cust_dna.items():
        taxon = cust_tax[key]
        n = len(dna)
        pris = [prif(dna[j:j + M]) for j in range(n - M + 1)]
        for mnz in {min(pris[i:i + K - M + 1]) for i in range(n - K + 1)}:
            records[mnz] = lca(records.get(mnz, 0), taxon)

    def classify(read):
        n = len(read)
        pris = [prif(read[j:j + M]) for j in range(n - M + 1)]
        counts = {}
        for i in range(n - K + 1):
            t = records.get(min(pris[i:i + K - M + 1]), 0)
            if t > 0:
                counts[t] = counts.get(t, 0) + 1
        if not counts:
            return 0

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

    with open(f"src/test/resources/golden/g09_freq_{tag}.tsv", "w") as f:
        for t in sorted(out):
            f.write(f"{t}\t{out[t]}\n")
    print("demoted:", len(demoted), "taxa:", len(out),
          "reads:", sum(out.values()))


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:])
