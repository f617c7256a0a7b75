#!/usr/bin/env python3
"""Independent golden derivation for g13_wide64_freq_classify at sf0.01.

m=64 with frequency demotion: the full-width key has no spare bit for the
demote flag, so the Scala scanner compares an out-of-band demotion rank
before the (hi, lo) priority words (WideScanner.priorityOf / priLess).
This models the whole thing from scratch with Python big ints: 128-bit
packed m-mers, canonicalization against the reverse complement, the
two-word XOR mask, the per-position canonical-mer frequency count with the
Spark tie order (count desc, then SIGNED hi, SIGNED lo — Spark longs), and
window minima over (demoted?, priority) tuples whose KEY is the priority
alone — demotion reorders selection but never alters stored key bits at
this width. Then the same index build + resolver as golden_g07 at k=66,
reads of 72 bp addressed by o_orderkey % 40. Run once; commit the output.
"""
import pyarrow.parquet as pq
from collections import Counter
from golden_g01 import dna_of, CODE

K, M = 66, 64
TOP_N = 65536
XOR_MASK = 0xE37E28C4271B5A2D
PRI_MASK = (XOR_MASK << 64) | XOR_MASK
MER_MASK = (1 << (2 * M)) - 1
TWO63, TWO64 = 1 << 63, 1 << 64


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


def canonical(mer):
    r = rc(mer, M)
    return mer if mer <= r else r


def signed(x):
    return x - TWO64 if x >= TWO63 else x


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

    cust_dna, cust_tax = {}, {}
    for key, name, nat in zip(customer.column("c_custkey").to_pylist(),
                              customer.column("c_name").to_pylist(),
                              customer.column("c_nationkey").to_pylist()):
        cust_dna[key] = dna_of(name)
        cust_tax[key] = 10 + nat

    # demotion set: every position's canonical wide mer counted over the
    # library; top-N by (count desc, signed hi asc, signed lo asc) — the
    # Spark orderBy over two signed long columns
    cnt = Counter()
    for dna in cust_dna.values():
        mer = 0
        for i, ch in enumerate(dna):
            mer = ((mer << 2) | CODE[ch]) & MER_MASK
            if i >= M - 1:
                cnt[canonical(mer)] += 1
    ranked = sorted(cnt.items(),
                    key=lambda kv: (-kv[1],
                                    signed(kv[0] >> 64),
                                    signed(kv[0] & (TWO64 - 1))))
    demoted = set(m for m, _ in ranked[:TOP_N])

    # priority tuple: out-of-band demotion rank FIRST, then the XORed
    # canonical value compared unsigned (Python big ints are unsigned)
    def prif(sub):
        canon = canonical(encode(sub))
        return ((1 if canon in demoted else 0), canon ^ PRI_MASK)

    records = {}
    for key, dna in cust_dna.items():
        taxon = cust_tax[key]
        n = len(dna)
        pris = [prif(dna[j:j + M]) for j in range(n - M + 1)]
        # KEY = the priority words only — the rank never enters the key
        for mnz in {min(pris[i:i + K - M + 1])[1] for i in range(n - K + 1)}:
            records[mnz] = lca(records.get(mnz, 0), taxon)

    def classify(read):
        n = len(read)
        pris = [prif(read[j:j + M]) for j in range(n - M + 1)]
        counts = {}
        for i in range(n - K + 1):
            t = records.get(min(pris[i:i + K - M + 1])[1], 0)
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
    n_demoted_keys = sum(1 for p in records
                         if (1 if (p ^ PRI_MASK) in demoted else 0))
    for okey, ckey in zip(orders.column("o_orderkey").to_pylist(),
                          orders.column("o_custkey").to_pylist()):
        pos = (okey % 40) + 1
        read = cust_dna[ckey][pos - 1:pos - 1 + 72]
        t = classify(read)
        out[t] = out.get(t, 0) + 1

    with open(f"src/test/resources/golden/g13_wide64_freq_{tag}.tsv", "w") as f:
        for t in sorted(out):
            f.write(f"{t}\t{out[t]}\n")
    print("demoted:", len(demoted), "index keys:", len(records),
          "demoted-selected keys:", n_demoted_keys,
          "taxa:", len(out), "reads:", sum(out.values()))


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:])
