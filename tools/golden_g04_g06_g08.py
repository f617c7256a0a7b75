#!/usr/bin/env python3
"""Independent goldens for g04_classify2, g06_index_stats and
g08_multisample at sf0.01, on top of the from-scratch kernel in golden_g01:

- g04: the 2-step dynamic pipeline — distinct-minimizer evidence, species
  clade selection at threshold 50, sub-library rebuild, re-classification.
- g06: respace 7->10 of the record keys (mask preserving all non-spaced
  bits) + LCA re-fold + taxonomic depth histogram.
- g08: per-sample classification, sample = 'S' + first char of the order
  priority, same reads as g03.

Run once; commit the outputs.
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
    nat_region = {}
    for n, r in zip(nation.column("n_nationkey").to_pylist(),
                    nation.column("n_regionkey").to_pylist()):
        parents[10 + n] = 2 + r
        nat_region[n] = r

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

    genomes = []  # (taxon, custkey, nationkey, slots)
    records = {}
    cust = {}
    for key, name, nat in zip(customer.column("c_custkey").to_pylist(),
                              customer.column("c_name").to_pylist(),
                              customer.column("c_nationkey").to_pylist()):
        dna = dna_of(name)
        pris = [priority(encode(dna[j:j + M])) for j in range(len(dna) - M + 1)]
        slots = [min(pris[i:i + K - M + 1]) for i in range(len(dna) - K + 1)]
        taxon = 10 + nat
        genomes.append((taxon, slots))
        cust[key] = (nat, dna)
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

    def classify(read, recmap):
        pris = [priority(encode(read[j:j + M])) for j in range(len(read) - M + 1)]
        counts = {}
        for i in range(len(read) - K + 1):
            t = recmap.get(min(pris[i:i + K - M + 1]), 0)
            if t > 0:
                counts[t] = counts.get(t, 0) + 1
        return resolve(counts) if counts else 0

    okeys = orders.column("o_orderkey").to_pylist()
    ockeys = orders.column("o_custkey").to_pylist()
    opris = orders.column("o_orderpriority").to_pylist()

    # ---------------- g06: respace 7 -> 10 + depth histogram ----------------
    # records are already folded; respace masks the RECORD keys and re-folds
    mask = -1 & ((1 << 64) - 1)
    for i in range(10):
        mask &= ~(3 << (2 * (2 * i + 1)))
    respaced = {}
    for mnz, taxon in records.items():
        key = mnz & mask
        respaced[key] = lca(respaced.get(key, 0), taxon)
    hist = {}
    for t in respaced.values():
        d = depth(t)
        hist[d] = hist.get(d, 0) + 1
    with open(f"src/test/resources/golden/g06_stats_{tag}.tsv", "w") as f:
        for d in sorted(hist):
            f.write(f"{d}\t{hist[d]}\n")

    # ---------------- g08: multisample classification ----------------
    out8 = {}
    for okey, ckey, pri in zip(okeys, ockeys, opris):
        nat, dna = cust[ckey]
        pos = (okey % 80) + 1
        t = classify(dna[pos - 1:pos - 1 + 44], records)
        sample = "S" + pri[0]
        out8[(sample, t)] = out8.get((sample, t), 0) + 1
    with open(f"src/test/resources/golden/g08_multisample_{tag}.tsv", "w") as f:
        for (s, t) in sorted(out8):
            f.write(f"{s}\t{t}\t{out8[(s, t)]}\n")

    # ---------------- g04: 2-step dynamic classification ----------------
    # reads: only orders of customers in even nations
    reads4 = []
    for okey, ckey in zip(okeys, ockeys):
        nat, dna = cust[ckey]
        if nat % 2 == 0:
            pos = (okey % 80) + 1
            reads4.append(dna[pos - 1:pos - 1 + 44])
    # evidence: distinct span-minimizer values hit per record taxon
    per_taxon = {}
    for read in reads4:
        pris = [priority(encode(read[j:j + M])) for j in range(len(read) - M + 1)]
        for i in range(len(read) - K + 1):
            mnz = min(pris[i:i + K - M + 1])
            t = records.get(mnz)
            if t is not None:
                per_taxon.setdefault(t, set()).add(mnz)
    # species-rank clade aggregation (species = nation level, depth 2);
    # evidence taxa above species rank contribute nothing
    at_rank = {}
    for t, mins in per_taxon.items():
        if t >= 10:  # nation-level = species rank
            at_rank[t] = at_rank.get(t, 0) + len(mins)
    selected = {t for t, c in at_rank.items() if c >= 50}
    # descendants of species = themselves (leaves)
    dyn_records = {}
    for taxon, slots in genomes:
        if taxon in selected:
            for mnz in set(slots):
                dyn_records[mnz] = lca(dyn_records.get(mnz, 0), taxon)
    out4 = {}
    for read in reads4:
        t = classify(read, dyn_records)
        out4[t] = out4.get(t, 0) + 1
    with open(f"src/test/resources/golden/g04_classify2_{tag}.tsv", "w") as f:
        for t in sorted(out4):
            f.write(f"{t}\t{out4[t]}\n")

    # -------- g10: PER-SAMPLE 2-step classification --------
    # sample = 'S' + priority digit; each sample's reads come only from
    # nations with nation % 5 == digit - 1, so selections differ per sample.
    # The whole g04 pipeline (evidence -> species selection at threshold 50
    # -> sub-library rebuild -> re-classification) runs independently per
    # sample — the engine must reproduce it in its one-pass grouped form.
    reads10 = {}
    for okey, ckey, pri in zip(okeys, ockeys, opris):
        nat, dna = cust[ckey]
        if nat % 5 == int(pri[0]) - 1:
            pos = (okey % 80) + 1
            reads10.setdefault("S" + pri[0], []).append(dna[pos - 1:pos - 1 + 44])
    out10 = {}
    for sample, rds in sorted(reads10.items()):
        per_taxon10 = {}
        for read in rds:
            pris = [priority(encode(read[j:j + M]))
                    for j in range(len(read) - M + 1)]
            for i in range(len(read) - K + 1):
                mnz = min(pris[i:i + K - M + 1])
                rt = records.get(mnz)
                if rt is not None:
                    per_taxon10.setdefault(rt, set()).add(mnz)
        sel = {rt for rt, mins in per_taxon10.items()
               if rt >= 10 and len(mins) >= 50}
        dyn10 = {}
        for taxon, slots in genomes:
            if taxon in sel:
                for mnz in set(slots):
                    dyn10[mnz] = lca(dyn10.get(mnz, 0), taxon)
        for read in rds:
            rt = classify(read, dyn10)
            out10[(sample, rt)] = out10.get((sample, rt), 0) + 1
    with open(f"src/test/resources/golden/g10_multisample2_{tag}.tsv", "w") as f:
        for (sm, rt) in sorted(out10):
            f.write(f"{sm}\t{rt}\t{out10[(sm, rt)]}\n")

    print("g06 depths:", hist, "| g08 cells:", len(out8),
          "| g04 selected:", len(selected), "taxa:", len(out4),
          "| g10 cells:", len(out10))


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:])
