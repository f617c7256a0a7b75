#!/usr/bin/env python3
"""Independent goldens for t08_simhash and t13_dedup_decisions at sf0.01.

- t08: 64-bit SimHash over shingle hashes (sign of per-bit vote sums),
  pigeonhole chunk banding (maxDist+1 chunks over 64 bits, last chunk takes
  the remainder), Hamming verification at maxDist=6.
- t13: union-find connected components over the t06-semantics MinHash
  verified pairs at threshold 0.5; cluster label = min doc id; keep = the
  labeling doc. (Only docs appearing in at least one pair are labeled.)

Run once; commit the outputs.
"""
import pyarrow.parquet as pq
from golden_t06 import shingle_set, minhash, band_keys, THRESHOLD

MAX_DIST = 6
CHUNKS = MAX_DIST + 1
BITS_PER = 64 // CHUNKS
M64 = (1 << 64) - 1


def simhash(shingles):
    acc = [0] * 64
    for h in shingles:
        hu = h & M64
        for b in range(64):
            acc[b] += 1 if (hu >> b) & 1 else -1
    r = 0
    for b in range(64):
        if acc[b] > 0:
            r |= 1 << b
    return r


def main():
    tbl = pq.read_table("/root/testdata/sf0.01/documents.parquet")
    docs = sorted(zip(tbl.column("doc_id").to_pylist(),
                      tbl.column("text").to_pylist()))
    shingles = {d: shingle_set(t) for d, t in docs}

    # ---------------- t08 ----------------
    sims = {d: simhash(sh) for d, sh in shingles.items() if sh}
    buckets = {}
    for d, sim in sims.items():
        for c in range(CHUNKS):
            lo = c * BITS_PER
            width = 64 - lo if c == CHUNKS - 1 else BITS_PER
            mask = (1 << width) - 1
            buckets.setdefault((c, (sim >> lo) & mask), []).append(d)
    pairs8 = set()
    for ids in buckets.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = min(ids[i], ids[j]), max(ids[i], ids[j])
                ham = bin(sims[a] ^ sims[b]).count("1")
                if ham <= MAX_DIST:
                    pairs8.add((a, b, ham))
    with open("src/test/resources/golden/t08_simhash_sf001.tsv", "w") as f:
        for a, b, h in sorted(pairs8):
            f.write(f"{a}\t{b}\t{h}\n")

    # ---------------- t13 ----------------
    # rebuild the t06 verified pairs (threshold 0.5)
    band_buckets = {}
    for d, _ in docs:
        for key in band_keys(minhash(shingles[d])):
            band_buckets.setdefault(key, []).append(d)
    cand = set()
    for ids in band_buckets.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    nodes = set()
    for a, b in sorted(cand):
        sa, sb = set(shingles[a]), set(shingles[b])
        inter = len(sa & sb)
        uni = max(len(sa) + len(sb) - inter, 1)
        if inter / uni >= THRESHOLD:
            nodes.add(a)
            nodes.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
    with open("src/test/resources/golden/t13_decisions_sf001.tsv", "w") as f:
        for d in sorted(nodes):
            c = find(d)
            f.write(f"{d}\t{c}\t{str(d == c).lower()}\n")
    print("t08 pairs:", len(pairs8), "t13 nodes:", len(nodes))


if __name__ == "__main__":
    main()
