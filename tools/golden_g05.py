#!/usr/bin/env python3
"""Independent golden derivation for g05_bracken at sf0.01.

Re-implements the bracken weight semantics from scratch: per genome, every
readLen window is classified against the independently built LCA record map
(golden_g02 semantics) with the Kraken 2 resolver, gated on >= 2 distinct
hit groups (distinct = super-mer minimizer differs from the previous
super-mer's), and (source taxon, dest taxon) window counts are aggregated.
Brute-force windows — no shared code with the Scala O(1) slide. Run once;
commit the output.
"""
import pyarrow.parquet as pq
from golden_g01 import dna_of, encode, priority, K, M

READ_LEN = 64


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
        if b == 0:
            return a
        while depth(a) > depth(b):
            a = parents[a]
        while depth(b) > depth(a):
            b = parents[b]
        while a != b:
            a, b = parents[a], parents[b]
        return a

    genomes = []  # (source taxon, dna)
    records = {}
    for name, nat in zip(customer.column("c_name").to_pylist(),
                         customer.column("c_nationkey").to_pylist()):
        dna = dna_of(name)
        genomes.append((10 + nat, dna))

    # per-genome chosen minimizer per k-mer slot (needed again below)
    def slot_minimizers(dna):
        pris = [priority(encode(dna[j:j + M])) for j in range(len(dna) - M + 1)]
        return [min(pris[i:i + K - M + 1]) for i in range(len(dna) - K + 1)]

    slot_cache = []
    for taxon, dna in genomes:
        slots = slot_minimizers(dna)
        slot_cache.append(slots)
        for mnz in set(slots):
            records[mnz] = lca(records.get(mnz, 0), taxon)

    def resolve(counts):
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
    kmers_per_window = READ_LEN - (K - 1)
    for (source, dna), slots in zip(genomes, slot_cache):
        # spans: runs of equal minimizer. In a single valid segment every
        # new span's minimizer differs from the previous by construction, so
        # the Scala 'distinct' flag is always true here — the hit-group gate
        # below counts spans with taxon != 0 directly.
        spans = []  # (first_slot, count, taxon)
        prev = None
        for i, mnz in enumerate(slots):
            if spans and mnz == prev:
                s = spans[-1]
                spans[-1] = (s[0], s[1] + 1, s[2])
            else:
                spans.append((i, 1, records.get(mnz, 0)))
            prev = mnz
        slot_span = []
        for si, (start, cnt, _) in enumerate(spans):
            slot_span.extend([si] * cnt)

        for w in range(len(dna) - READ_LEN + 1):
            lo, hi = w, w + kmers_per_window - 1
            counts = {}
            groups = set()
            for p in range(lo, hi + 1):
                si = slot_span[p]
                t = spans[si][2]
                counts[t] = counts.get(t, 0) + 1
                if t != 0:
                    groups.add(si)
            scoring = {t: c for t, c in counts.items() if t != 0}
            dest = 0 if (len(groups) < 2 or not scoring) else resolve(scoring)
            out[(source, dest)] = out.get((source, dest), 0) + 1

    with open(f"src/test/resources/golden/g05_bracken_{tag}.tsv", "w") as f:
        for (s, d) in sorted(out):
            f.write(f"{s}\t{d}\t{out[(s, d)]}\n")
    print("pairs:", len(out), "windows:", sum(out.values()))


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:])
