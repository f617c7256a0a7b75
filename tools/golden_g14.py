#!/usr/bin/env python3
"""Independent golden derivation for g14_xwide_classify at sf0.01.

The extra-wide (m=96 > 64: three-long keys) minimizer kernel re-done from
scratch: three-word packed m-mers are modeled as plain Python ints (192
bits), canonicalized against the reverse complement, XORed with the Kraken 2
toggle mask replicated on all three words (top word holds a full 32 bases at
m=96, so no truncation), compared unsigned — then the same independent index
build and resolver as golden_g02/g03/g07 at k=100, reads of 112 bp addressed
by o_orderkey % 16. Run once; commit the output.
"""
import pyarrow.parquet as pq
from golden_g01 import dna_of, CODE

K, M = 100, 96
XOR_MASK = 0xE37E28C4271B5A2D
WORD64 = (1 << 64) - 1

# all three words carry the full mask (topBases = 32 -> no truncation)
PRI_MASK = (XOR_MASK << 128) | (XOR_MASK << 64) | XOR_MASK


def encode(s):
    v = 0
    for ch in s:
        v = (v << 2) | CODE[ch]
    return v


def rc(mer, m):
    out = 0
    for _ in range(m):
        out = (out << 2) | (3 - (mer & 3))
        mer >>= 2
    return out


def priority(mer):
    r = rc(mer, M)
    canon = mer if mer <= r else r
    return canon ^ PRI_MASK


def minimizers(dna):
    n = len(dna)
    pris = [priority(encode(dna[j:j + M])) for j in range(n - M + 1)]
    return {min(pris[i:i + K - M + 1]) for i in range(n - K + 1)}


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

    records = {}
    cust_dna = {}
    for key, name, nat in zip(customer.column("c_custkey").to_pylist(),
                              customer.column("c_name").to_pylist(),
                              customer.column("c_nationkey").to_pylist()):
        dna = dna_of(name)
        cust_dna[key] = dna
        for mnz in minimizers(dna):
            records[mnz] = lca(records.get(mnz, 0), 10 + nat)

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
        pos = (okey % 16) + 1
        read = cust_dna[ckey][pos - 1:pos - 1 + 112]
        t = classify(read)
        out[t] = out.get(t, 0) + 1

    with open(f"src/test/resources/golden/g14_xwide_{tag}.tsv", "w") as f:
        for t in sorted(out):
            f.write(f"{t}\t{out[t]}\n")
    print("taxa:", len(out), "reads:", sum(out.values()))


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:])
