#!/usr/bin/env python3
"""Independent golden for t15_source_similarity at sf0.01.

Per-source MinHash sketches (128 hashes, signed minima over every doc's
shingle hashes) and pairwise estimated Jaccard = matching positions / 128,
HALF_UP-rounded to 4 places like Spark's round(); pairs with zero matching
positions are never emitted (the distributed join never materializes them).
Run once; commit the output.
"""
from decimal import Decimal, ROUND_HALF_UP
import pyarrow.parquet as pq
from golden_t09_t10 import mix64, M64
from golden_t06 import shingle_set, signed

NUM_HASHES = 128
PA = [(mix64(2 * i + 1) | 1) for i in range(NUM_HASHES)]
PB = [mix64(2 * i + 2) for i in range(NUM_HASHES)]


def main():
    tbl = pq.read_table("/root/testdata/sf0.01/documents.parquet")
    sigs = {}
    for src, text in zip(tbl.column("source").to_pylist(),
                         tbl.column("text").to_pylist()):
        sig = sigs.setdefault(src, [(1 << 63) - 1] * NUM_HASHES)
        for s in shingle_set(text):
            for i in range(NUM_HASHES):
                h = signed(mix64((PA[i] * s + PB[i]) & M64))
                if h < sig[i]:
                    sig[i] = h
    sources = sorted(sigs)
    with open("src/test/resources/golden/t15_source_sim_sf001.tsv", "w") as f:
        for i in range(len(sources)):
            for j in range(i + 1, len(sources)):
                a, b = sources[i], sources[j]
                matches = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
                if matches > 0:
                    est = Decimal(matches) / Decimal(NUM_HASHES)
                    est = est.quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
                    f.write(f"{a}\t{b}\t{est.normalize()}\n")
    print("sources:", len(sources))


if __name__ == "__main__":
    main()
