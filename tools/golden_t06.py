#!/usr/bin/env python3
"""Independent golden derivation for t06_minhash_lsh at sf0.01.

Reimplements the full MinHash-LSH dedup pipeline from scratch: FNV-1a +
splitmix64 string hashing (golden_t09_t10 semantics), word 3-gram shingle
sets, 64-hash MinHash signatures with SIGNED 64-bit minima (Scala Long
comparison), FNV-seeded band keys, candidate pairing on shared (band,
bucket), and exact-Jaccard verification at threshold 0.5. Run once; commit
the output.
"""
import pyarrow.parquet as pq
from decimal import Decimal, ROUND_HALF_UP
from golden_t09_t10 import mix64, hash_string, M64

NUM_HASHES, BANDS, SHINGLE_N, THRESHOLD = 64, 16, 3, 0.5
ROWS = NUM_HASHES // BANDS


def signed(x):
    return x - (1 << 64) if x >= (1 << 63) else x


def shingle_set(text):
    toks = [t for t in text.strip().split() if t]
    if len(toks) < SHINGLE_N:
        return [] if not toks else [hash_string(" ".join(toks))]
    return sorted({hash_string(" ".join(toks[i:i + SHINGLE_N]))
                   for i in range(len(toks) - SHINGLE_N + 1)})


PA = [(mix64(2 * i + 1) | 1) for i in range(NUM_HASHES)]
PB = [mix64(2 * i + 2) for i in range(NUM_HASHES)]


def minhash(shingles):
    sig = [(1 << 63) - 1] * NUM_HASHES  # Long.MaxValue
    for s in shingles:
        for i in range(NUM_HASHES):
            h = signed(mix64((PA[i] * s + PB[i]) & M64))
            if h < sig[i]:
                sig[i] = h
    return sig


def band_keys(sig):
    if all(v == (1 << 63) - 1 for v in sig):
        return []
    out = []
    for b in range(BANDS):
        h = 0xCBF29CE484222325 ^ b
        for r in range(ROWS):
            h = mix64(h ^ (sig[b * ROWS + r] & M64))
        out.append((b, h))
    return out


def main():
    tbl = pq.read_table("/root/testdata/sf0.01/documents.parquet")
    docs = sorted(zip(tbl.column("doc_id").to_pylist(),
                      tbl.column("text").to_pylist()))
    shingles = {d: shingle_set(t) for d, t in docs}
    buckets = {}
    for d, _ in docs:
        for key in band_keys(minhash(shingles[d])):
            buckets.setdefault(key, []).append(d)
    pairs = set()
    for ids in buckets.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = min(ids[i], ids[j]), max(ids[i], ids[j])
                pairs.add((a, b))
    with open("src/test/resources/golden/t06_minhash_sf001.tsv", "w") as f:
        kept = 0
        for a, b in sorted(pairs):
            sa, sb = set(shingles[a]), set(shingles[b])
            inter = len(sa & sb)
            uni = max(len(sa) + len(sb) - inter, 1)
            j = inter / uni
            if j >= THRESHOLD:
                # Spark round() is HALF_UP; Python round() is half-even and
                # would diverge on dyadic ties like 17/32
                jr = (Decimal(inter) / Decimal(uni)).quantize(
                    Decimal("0.0001"), rounding=ROUND_HALF_UP)
                f.write(f"{a}\t{b}\t{jr.normalize()}\n")
                kept += 1
    print("candidates:", len(pairs), "kept:", kept)


if __name__ == "__main__":
    main()
